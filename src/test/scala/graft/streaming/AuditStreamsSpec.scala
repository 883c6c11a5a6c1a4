package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-batch contract audit must pass a clean batch and flag each
  * corruption in a later batch, with reports attributed to the right
  * batch id.
  */
class AuditStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming audit flags the corrupt batch only") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("auditstream").toFile.getAbsolutePath
    val clean = Seq((1L, 10L, "O", 5.0), (2L, 11L, "F", 6.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val corrupt = Seq(
      (3L, 10L, "O", 5.0),
      (3L, 99L, "X", 5.0)) // dup key, bad status, dim key 99 missing
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    clean.coalesce(1).write.parquet(s"$tmp/src/b1")
    corrupt.coalesce(1).write.parquet(s"$tmp/src/b2")
    val dim = Seq(10L, 11L).toDF("c_custkey")

    val reports = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, Boolean)]
    val stream = spark.readStream.schema(clean.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src/*")
    val q = AuditStreams.streamingContractAudit(stream, dim, s"$tmp/ckpt",
      rep => reports.synchronized {
        reports ++= rep.collect().map(r =>
          (r.getLong(4), r.getString(0), r.getBoolean(3)))
      })
    q.processAllAvailable()
    q.stop()

    val byBatch = reports.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(byBatch.keySet == Set(0L, 1L))
    // file order under maxFilesPerTrigger=1 is lexicographic: b1 then b2
    val (first, second) = (byBatch(0L), byBatch(1L))
    assert(first.values.forall(identity), s"clean batch flagged: $first")
    assert(!second("uniqueness") && !second("domain") && !second("ref_integrity"),
      s"corruptions not flagged: $second")
    assert(second("row_count") && second("completeness"))
  }
}
