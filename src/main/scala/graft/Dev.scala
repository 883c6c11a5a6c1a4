package graft
import java.sql.{Date, Timestamp}
import java.time.{LocalDate, ZoneId, ZonedDateTime}

import graft.pipeline._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{Row, SparkSession}

import scala.jdk.CollectionConverters._

/** Scratch runner for local iteration (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val et = ZoneId.of("America/New_York")
    def ts(y: Int, m: Int, d: Int) = Timestamp.from(ZonedDateTime.of(y, m, d, 23, 59, 59, 0, et).toInstant)
    def dt(y: Int, m: Int, d: Int) = Date.valueOf(LocalDate.of(y, m, d))
    val sierra = PatronPipeline.withCanonicalId(spark.createDataFrame(Seq(
      Row(123L, 4, 5, "lib1", "New York", "NY", "10001-1234", "123 REAL AVE",
        dt(2021, 1, 1), null, ts(2021, 1, 3), ts(2020, 12, 31))).asJava,
      Schemas.sierraActive))
    val deps = PatronPipeline.Deps(
      new Sha256Obfuscator("salt"),
      new MapGeocoder(Map("123" -> "36061018900")),
      new MapGeocoder(Map.empty),
      keys => spark.createDataFrame(Seq.empty[Row].asJava, Schemas.redshiftAddress),
      keys => spark.createDataFrame(Seq.empty[Row].asJava, Schemas.redshiftPatron),
      keys => spark.createDataFrame(Seq.empty[Row].asJava, Schemas.redshiftIphlc))
    val out = PatronPipeline.processActivePatrons(
      sierra, PipelineMode.NewPatrons, deps, Seq(col("last_updated_timestamp")))
    val bytes = AvroSink.encode(out).collect()
    println(s"AVRO_RECORDS=${bytes.length}")
    bytes.foreach(r => println("DECODED=" + AvroSink.decode(r.getAs[Array[Byte]](0))))
    spark.stop()
  }
}
