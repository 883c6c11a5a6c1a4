package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scratch runner (not part of the driver contract): dump ONE OR MORE
  * named SparkEntry queries + their oracle SQL to an out dir in the
  * exact layout graft.Verify uses, so `tools/t2check.py <outDir>` can
  * gate just those queries during iteration instead of re-running all.
  *
  * Usage: `runMain graft.VerifyOne <outDir> <name> [<name> ...]`
  * (sf dir via SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01).
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      graft.operators.TransientPersists.releaseAll()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
