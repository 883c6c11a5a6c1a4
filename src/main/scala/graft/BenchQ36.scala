package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BenchQ36 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      for (p <- 1 to 3) { val t0=System.nanoTime(); f; println(f"[bench] $name pass$p ${(System.nanoTime()-t0)/1e9}%.2f s") }
    }
    time("q30_brute")(SparkEntry.queries("q30_embed_neardup")(spark, dir).write.format("noop").mode("overwrite").save())
    time("q36_lsh")(SparkEntry.queries("q36_embed_neardup_lsh")(spark, dir).write.format("noop").mode("overwrite").save())
    // candidate volume
    val e = Tables.embeddings(spark, dir)
    val bucketsUdf = udf { v: Seq[Float] => graft.functions.Hashing.hyperplaneBandBuckets(v, 4, 64) }
    val banded = e.select(col("vec_id"), explode(bucketsUdf(col("embedding"))).as("bucket"))
    println("[bench] banded rows: " + banded.count())
    val l = banded.select(col("bucket"), col("vec_id").as("a"))
    val r = banded.select(col("bucket"), col("vec_id").as("b"))
    println("[bench] joined candidate rows (with dups): " + l.join(r, Seq("bucket")).filter(col("a") < col("b")).count())
    spark.stop()
  }
}
