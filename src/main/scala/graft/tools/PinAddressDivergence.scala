package graft.tools

import graft.pipeline.AddressParser._

/** Round-tooling generator (no Spark): dumps the rule tagger's CURRENT
  * output for every documented-divergence row of the address corpus to
  * `goldens/address_divergence_pins.tsv`. AddressCorpusSpec asserts
  * those pins verbatim, so any drift in how the parser handles the 5
  * divergent structural classes fails a test instead of silently
  * changing geocode inputs (r14 verdict #6). Re-run this main ONLY
  * after an intentional parser change, and review the diff like any
  * golden update.
  */
object PinAddressDivergence {
  private val divClasses = Set("div_lowercase_city", "div_suffix_city",
    "div_directional_city", "div_nosuffix_multicity", "div_lowercase_state")

  def main(args: Array[String]): Unit = {
    val src = scala.io.Source.fromFile("goldens/address_corpus.tsv", "UTF-8")
    val rows = try src.getLines().drop(1).map { line =>
      val f = line.split('\t').padTo(7, "")
      (f(0), Seq(f(1), f(2), f(3), f(4), f(5), f(6)).filter(_.nonEmpty)
        .mkString(" "))
    }.toList finally src.close()
    val out = new StringBuilder(
      "class\tfull\taddress\tcity\tregion\tpostal\thouse\tstreet\n")
    rows.filter(r => divClasses(r._1)).foreach { case (cls, full) =>
      val p = reformat(AddressParts("", "", "", "", full))
      out.append(Seq(cls, full, p.address, p.city, p.region, p.postalCode,
        p.houseNumber, p.streetName).mkString("\t")).append('\n')
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("goldens/address_divergence_pins.tsv"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${rows.count(r => divClasses(r._1))} pins")
  }
}
