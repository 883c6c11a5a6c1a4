package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Char-bigram NB language ID: real accuracy on crafted multilingual
  * snippets (the sf corpus's lang label is independent of its text, so
  * the q173 gate proves exactness but cannot prove the model LEARNS —
  * this spec does, on genuine English/Spanish/French/German text),
  * plus the determinism and short-text edge cases.
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 3 training + 1 held-out snippet per language, natural text with
  // language-distinctive character statistics (th/ñ/é/ß, articles,
  // digraphs). Held-out rows are the odd ids.
  private val rows = Seq(
    (0L, "en", "the quick brown fox jumps over the lazy dog with their friends"),
    (2L, "en", "this is another sentence that should look like ordinary english writing"),
    (4L, "en", "which of these things would you rather have with your breakfast today"),
    (1L, "en", "there is nothing better than reading through the whole thing together"),
    (10L, "es", "el rápido zorro marrón salta sobre el perro perezoso con sus amigos"),
    (12L, "es", "esta es otra oración que debería parecer una escritura española normal"),
    (14L, "es", "cuál de estas cosas preferirías tener con tu desayuno esta mañana"),
    (11L, "es", "no hay nada mejor que leer todo el texto juntos en la biblioteca"),
    (20L, "fr", "le renard brun rapide saute par dessus le chien paresseux avec ses amis"),
    (22L, "fr", "ceci est une autre phrase qui devrait ressembler à un texte français"),
    (24L, "fr", "laquelle de ces choses préférez vous avoir avec votre petit déjeuner"),
    (21L, "fr", "il n'y a rien de mieux que de lire tout le texte ensemble à la maison"),
    (30L, "de", "der schnelle braune fuchs springt über den faulen hund mit seinen freunden"),
    (32L, "de", "dies ist ein weiterer satz der wie gewöhnliches deutsches schreiben aussieht"),
    (34L, "de", "welches dieser dinge hättest du lieber zu deinem frühstück heute morgen"),
    (31L, "de", "es gibt nichts besseres als den ganzen text zusammen zu lesen"))

  test("NB bigram profiles classify held-out natural-language snippets") {
    import spark.implicits._
    val docs = rows.toDF("id", "lang", "text")
    val pred = LangId.nbPredict(docs, "id", "text", "lang", n = 2,
        trainPred = col("id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = rows.map(r => r._1 -> r._2).toMap
    // every held-out (odd-id) snippet must classify correctly
    val heldOut = rows.map(_._1).filter(_ % 2 == 1)
    heldOut.foreach { id =>
      assert(pred(id) == truth(id), s"doc $id: ${pred(id)} != ${truth(id)}")
    }
    // and training rows trivially so (sanity: the model isn't degenerate)
    assert(rows.count(r => pred(r._1) == r._2) == rows.size)
  }

  test("deterministic: same input twice, permuted partitioning") {
    import spark.implicits._
    val docs = rows.toDF("id", "lang", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      LangId.nbPredict(df, "id", "text", "lang", 2, col("id") % 2 === 0)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
  }

  test("short / empty texts survive (no grams → prior + all-miss score)") {
    import spark.implicits._
    val docs = (rows ++ Seq((90L, "en", "a"), (91L, "en", ""))).toDF("id", "lang", "text")
    val pred = LangId.nbPredict(docs, "id", "text", "lang", 2, col("id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // gramless docs still get a deterministic argmax (min lang among
    // max-prior languages); they must be PRESENT, not dropped
    assert(pred.contains(90L) && pred.contains(91L))
    assert(pred.size == docs.count())
  }
}
