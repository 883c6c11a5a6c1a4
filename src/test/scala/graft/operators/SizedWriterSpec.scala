package graft.operators

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SizedWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def partFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq

  test("file count tracks the byte target and data round-trips exactly") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    val out = Files.createTempDirectory("sized-writer").toString
    val (nFiles, bpr) = SizedWriter.writeSized(docs, out, targetFileBytes = 8 * 1024)
    assert(bpr > 0)
    assert(partFiles(out).size == nFiles)
    // every file within a loose band of the target (sample-estimate bias
    // and per-file parquet overhead both push sizes around)
    val sizes = partFiles(out).map(_.length())
    assert(sizes.forall(_ < 4 * 8 * 1024), s"oversized file in $sizes")
    assert(nFiles > 1, "500 docs at an 8 KB target must split")
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select(sum(length(col("text")))).head.getLong(0) ==
      docs.select(sum(length(col("text")))).head.getLong(0))
  }

  test("clusterBy yields disjoint per-file key ranges (scan-prunable layout)") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val out = Files.createTempDirectory("sized-writer-clustered").toString
    val (nFiles, _) = SizedWriter.writeSized(docs, out,
      targetFileBytes = 8 * 1024, clusterBy = Seq("doc_id"))
    assert(nFiles > 1)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("hash sample is unbiased on partition-ordered heterogeneous input") {
    // First partitions hold ultra-compressible rows, last partitions
    // incompressible ones. A limit()-based sample would estimate
    // density from the compressible stratum only and undersize the
    // file count ~10x; the content-hash sample touches every partition.
    import spark.implicits._
    val compressible = (0 until 512).map(i => (i.toLong, "a" * 512))
    val random = (512 until 1024).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(8)(rnd.nextString(64)).mkString)
    }
    val docs = spark.createDataset(compressible ++ random)
      .toDF("doc_id", "text").repartitionByRange(8, col("doc_id"))
    val out = Files.createTempDirectory("sized-writer-hetero").toString
    val (nFiles, _) =
      SizedWriter.writeSized(docs, out, targetFileBytes = 64 * 1024,
        sampleRows = 128)
    val sizes = partFiles(out).map(_.length())
    assert(sizes.forall(_ < 3 * 64 * 1024),
      s"oversized file => sample missed the incompressible stratum: $sizes")
    assert(spark.read.parquet(out).count() == 1024)
    assert(nFiles == partFiles(out).size)
  }

  test("empty input writes an empty but readable dataset") {
    val docs = Tables.documents(spark, dir).filter(lit(false))
    val out = Files.createTempDirectory("sized-writer-empty").toString
    val (nFiles, bpr) = SizedWriter.writeSized(docs, out, targetFileBytes = 1024)
    assert(nFiles == 1 && bpr == 0.0)
    assert(spark.read.parquet(out).count() == 0)
  }
}
