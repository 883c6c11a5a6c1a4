package graft.streaming

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import java.time.{LocalDate, ZoneId, ZonedDateTime}

import graft.TestSpark
import graft.pipeline._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** O1 shared-dedup semantics (SURVEY §7.4 risk 5): one query over all
  * three mode streams; a patron created AND updated in the window is
  * emitted once, by the NEW branch — the reference's sequential-run
  * behavior (`processed_ids` is instance-level across modes).
  */
class RunAllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val et = ZoneId.of("America/New_York")
  private def ts(y: Int, m: Int, d: Int): Timestamp =
    Timestamp.from(ZonedDateTime.of(y, m, d, 23, 59, 59, 0, et).toInstant)
  private def dt(y: Int, m: Int, d: Int): Date = Date.valueOf(LocalDate.of(y, m, d))

  test("patron in NEW and UPDATED windows emits once, via NEW") {
    val dir = Files.createTempDirectory("runall").toFile.getAbsolutePath
    def active(r: Row*) = spark.createDataFrame(r.asJava, Schemas.sierraActive)
    def deleted(r: Row*) = spark.createDataFrame(r.asJava, Schemas.sierraDeleted)

    // 123 appears in both NEW and UPDATED; 456 only UPDATED; 999 deleted.
    active(Row(123L, 4, 5, "lib1", "c", "r", "11111", "1 ave", dt(2021, 1, 1),
      null, ts(2021, 1, 3), ts(2020, 12, 28), 1, 1)).write.parquet(s"$dir/new")
    active(
      Row(123L, 4, 5, "lib1", "c", "r", "11111", "1 ave", dt(2021, 1, 1),
        null, ts(2021, 1, 3), ts(2020, 12, 28), 1, 1),
      Row(456L, 5, 6, "lib2", "c", "r", "22222", "2 ave", dt(2021, 2, 1),
        null, ts(2021, 2, 3), ts(2020, 12, 29), 1, 1)).write.parquet(s"$dir/upd")
    deleted(Row(999L, dt(2022, 1, 1))).write.parquet(s"$dir/del")

    val addressTable = spark.createDataFrame(Seq.empty[Row].asJava, Schemas.redshiftAddress)
    val iphlcTable = spark.createDataFrame(
      Seq(Row("obf(123)", "aa"), Row("obf(456)", "bb")).asJava, Schemas.redshiftIphlc)
    val patronTable = spark.createDataFrame(Seq.empty[Row].asJava, Schemas.redshiftPatron)
    val deps = PatronPipeline.Deps(
      new MapObfuscator(Map.empty), // obf(x) fallback is deterministic
      new MapGeocoder(Map("123" -> "g1", "456" -> "g2")),
      new MapGeocoder(Map.empty),
      PatronPipeline.staticLookup(addressTable, "address_hash"),
      PatronPipeline.staticLookup(patronTable, "patron_id"),
      PatronPipeline.staticLookup(iphlcTable, "patron_id"))

    def rs(p: String) = spark.readStream.schema(
        if (p == "del") Schemas.sierraDeleted else Schemas.sierraActive)
      .parquet(s"$dir/$p")

    StreamSinkLog.reset()
    val q = PatronStream.runAll(rs("new"), rs("upd"), rs("del"), deps,
      s"$dir/ckpt", new StreamSinkLog)
    q.awaitTermination(120000)

    val decoded = StreamSinkLog.records.map(AvroSink.decode(_))
      .map(r => (r.get("patron_id").toString,
        Option(r.get("initial_patron_home_library_code")).map(_.toString).orNull,
        Option(r.get("deletion_date_et")).map(_.toString).orNull))
      .sortBy(_._1)
    // 123 once (NEW branch: iphlc = its own home code, not the warehouse
    // 'aa' the UPDATED branch would fetch); 456 via UPDATED (iphlc 'bb');
    // 999 via DELETED.
    assert(decoded == Seq(
      ("obf(123)", "lib1", null),
      ("obf(456)", "bb", null),
      ("obf(999)", null, "2022-01-01")))
  }
}
