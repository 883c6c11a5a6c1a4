package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Property tests for the scalar semantics SURVEY §5 calls out
  * (F2 null-placement, F13 canonicalization, F8/F9 sanitize laws,
  * IN-list SQL escaping).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // scalatest/scalacheck bridge isn't on the classpath — a hand-rolled
  // sampler keeps the property style with plain ScalaCheck Gens.
  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(org.scalacheck.Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val optStr: Gen[Option[String]] = Gen.option(
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', ' ', '\'', '"', 'é')))
      .map(_.mkString))

  test("F2: address hash plaintext preserves empty slots (concat+coalesce, not concat_ws)") {
    val schema = StructType(Seq("patron_id_plaintext", "address", "city",
      "region", "postal_code").map(StructField(_, StringType)))
    forAll(Gen.listOfN(4, optStr)) { parts =>
      val Seq(a, c, r, p) = parts
      val df = spark.createDataFrame(
        Seq(Row("42", a.orNull, c.orNull, r.orNull, p.orNull)).asJava, schema)
      val got = df.select(PatronPipeline.addressHashPlaintext).head().getString(0)
      val expect = "42_" + a.getOrElse("") + "_" + c.getOrElse("") + "_" +
        r.getOrElse("") + "_" + p.getOrElse("")
      assert(got == expect)
    }
  }

  test("F13: canonical id cast yields digit strings, never '.0' forms") {
    forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { id =>
      val df = spark.createDataFrame(
        Seq(Row(java.lang.Long.valueOf(id))).asJava,
        StructType(Seq(StructField("patron_id_plaintext",
          org.apache.spark.sql.types.LongType))))
      val got = PatronPipeline.withCanonicalId(df).head().getString(0)
      assert(got == id.toString)
    }
  }

  test("F9 sanitize laws: output alphabet is the whitelist; idempotent") {
    forAll(Gen.asciiPrintableStr, Gen.oneOf("ÁÉÍ∆Ø漢字", "ümlaut-ß")) { (s, extra) =>
      val in = s + extra
      val city = AddressParser.sanitizeCityRegion(in)
      assert(city.forall(ch =>
        ch.isLetter && ch < 'ā' || ch == '-' || ch.isWhitespace || ch.isLetter))
      assert(AddressParser.sanitizeCityRegion(city) == city)
      val postal = AddressParser.sanitizePostal(in)
      assert(postal.forall(ch => ch.isDigit || ch == '-'))
      assert(AddressParser.sanitizePostal(postal) == postal)
      val street = AddressParser.sanitizeStreet(in)
      assert(AddressParser.sanitizeStreet(street) == street)
    }
  }

  test("JdbcLookup.inListQuery escapes quotes and injects nothing") {
    forAll(Gen.nonEmptyListOf(optStr.map(_.getOrElse("")))) { keys =>
      val sql = JdbcLookup.inListQuery("t", Seq("a", "b"), "k", keys)
      assert(sql.startsWith("SELECT a, b FROM t WHERE k IN ("))
      // every single quote in a key is doubled → quote count parity holds
      val inList = sql.substring(sql.indexOf("(") + 1, sql.length - 1)
      assert(inList.count(_ == '\'') % 2 == 0)
    }
  }

  test("E3 tagger: reformat is total and outputs obey the sanitize laws") {
    val junkChar = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
      ' ', '&', '#', '$', '%', '.', ',', '-', '/', 'ß', 'Á', '∆', '\''))
    val junkStr = Gen.listOf(junkChar).map(_.mkString)
    forAll(junkStr, junkStr) { (a, b) =>
      val parts = AddressParser.AddressParts(a, b, "", "", s"$a $b")
      val out = AddressParser.reformat(parts) // must not throw on any input
      assert(out.postalCode.forall(ch => ch.isDigit || ch == '-'))
      assert(AddressParser.sanitizeStreet(out.address) == out.address)
      assert(AddressParser.sanitizeCityRegion(out.city) == out.city)
    }
  }

  test("E3 tagger: well-formed addresses round-trip house/state/zip") {
    val num = Gen.chooseNum(1, 9999).map(_.toString)
    val street = Gen.oneOf("Main", "Elm", "Ocean", "42nd")
    val suffix = Gen.oneOf("St", "Ave", "Blvd", "Rd")
    val city = Gen.oneOf("Brooklyn", "Queens", "Yonkers")
    val zip = Gen.chooseNum(10000, 99999).map(_.toString)
    forAll(Gen.zip(num, street, suffix, city, zip)) {
      case (n, s, sfx, c, z) =>
        val full = s"$n $s $sfx $c NY $z"
        val out = AddressParser.reformat(
          AddressParser.AddressParts("", "", "", "", full))
        assert(out.houseNumber == n)
        assert(out.streetName == s"$s $sfx")
        assert(out.city == c)
        assert(out.region == "NY")
        assert(out.postalCode == z)
        assert(out.address == s"$n $s $sfx")
    }
  }

  test("Hashing.shingleSet matches the SQL oracle form on random token lists") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.listOfN(8, word), Gen.chooseNum(1, 4)) { (words, k) =>
      val text = words.mkString(" ")
      val got = graft.functions.Hashing.shingleSet(text, k).toSeq
      val expect =
        if (words.length >= k)
          words.sliding(k).map(_.mkString(" ")).toSeq.distinct
        else Seq(words.mkString(" "))
      assert(got == expect)
    }
  }
}
