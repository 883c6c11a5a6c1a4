package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for CDC log application beyond what the q116 oracle
  * covers: tombstone-then-reinsert, log-only inserts, and the
  * last-writer tiebreak on the secondary sequence column.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def apply(base: Seq[(Long, String)],
                    log: Seq[(Long, Int, Long, String, String)]) = {
    import spark.implicits._
    Cdc.applyLog(
      base.toDF("k", "attr"),
      log.toDF("k", "t", "id", "op", "attr"),
      Seq("k"), Seq("t", "id"), "op", Seq("attr"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
  }

  test("upsert wins, tombstone deletes, untouched base survives") {
    val got = apply(
      base = Seq((1L, "a"), (2L, "b"), (3L, "c")),
      log = Seq(
        (1L, 1, 10L, "U", "a2"), // upsert over base
        (2L, 1, 11L, "U", "b2"), (2L, 2, 12L, "D", null), // delete after upsert
        (4L, 1, 13L, "U", "d"))) // insert of a key absent from base
    assert(got == Seq((1L, "a2", "log"), (3L, "c", "base"), (4L, "d", "log")))
  }

  test("delete then reinsert keeps the key; last writer wins on tie column") {
    val got = apply(
      base = Seq((1L, "a")),
      log = Seq(
        (1L, 1, 10L, "D", null), (1L, 2, 11L, "U", "back"),
        // same t: higher id is the later writer
        (1L, 3, 20L, "U", "lo"), (1L, 3, 21L, "U", "hi")))
    assert(got == Seq((1L, "hi", "log")))
  }

  test("empty log is identity on base") {
    val got = apply(base = Seq((1L, "a"), (2L, "b")), log = Seq.empty)
    assert(got == Seq((1L, "a", "base"), (2L, "b", "base")))
  }
}
