package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-tooling dev main (never invoked by the driver): A/B-times two
  * expression forms of the SAME computation inside ONE JVM, alternating
  * runs so external box load hits both arms equally — the measurement
  * harness for interpreted-HOF-vs-codegen rewrites where shuffle bytes
  * are identical and wall is the only signal.
  *
  * Probes (args(0)):
  *  - "pos": q126/q127's per-position 40-char-gram md5 pipeline —
  *    transform-lambda vs explode+project (both noop-materialized with
  *    the same downstream count-distinct agg so the whole map stage
  *    runs).
  *  - "tri": q140/q139-style word-trigram formation — transform-lambda
  *    vs posexplode+element_at projection.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val probe = if (args.nonEmpty) args(0) else "pos"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val L = 40

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = probe match {
      case "pos" => Seq(
        "transform-lambda" -> (() => docs.filter(length(col("text")) >= L)
          .select(col("doc_id"), explode(expr(
            s"""transform(sequence(1, length(text) - $L + 1),
               |          i -> struct(i AS p, unhex(md5(substring(text, i, $L))) AS g))"""
              .stripMargin)).as("x"))
          .select(col("doc_id"), col("x.p").as("p"), col("x.g").as("g"))
          .groupBy("g").count()),
        "explode+project" -> (() => docs.filter(length(col("text")) >= L)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - L + 1)).as("p"))
          .select(col("doc_id"), col("p"),
            unhex(md5(expr(s"substring(text, p, $L)"))).as("g"))
          .groupBy("g").count()))
      case "tri" => Seq(
        "transform-lambda" -> (() => docs
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(ws) - 2),
              |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
              |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))),
        "explode+project" -> (() => docs
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
          .select(col("doc_id"), col("ws"),
            explode(sequence(lit(1), size(col("ws")) - 2)).as("i"))
          .select(col("doc_id"), concat_ws(" ",
            element_at(col("ws"), col("i")),
            element_at(col("ws"), col("i") + 1),
            element_at(col("ws"), col("i") + 2)).as("g"))
          .groupBy("g").count()))
      case "q126" =>
        import org.apache.spark.sql.DataFrame
        def q126From(pos: DataFrame): DataFrame = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("p")
          val hot = pos.groupBy("g").agg(count(lit(1)).as("c"))
            .filter(col("c") >= 2).select("g")
          val cov = pos
            .join(hot, Seq("g"), "left_semi")
            .withColumn("prev", lag(col("p"), 1).over(w))
            .withColumn("contrib",
              when(col("prev").isNull, lit(40L))
                .otherwise(least(col("p") - col("prev"), lit(40L))))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_dup_positions"),
              sum(col("contrib")).as("dup_chars"))
          docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
            .join(cov, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
              coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
              round(coalesce(col("dup_chars"), lit(0L)).cast("double") /
                col("len").cast("double"), 4).as("dup_frac"))
            .orderBy("doc_id")
        }
        Seq(
          "transform-lambda" -> (() => q126From(
            docs.filter(length(col("text")) >= L)
              .select(col("doc_id"), explode(expr(
                s"""transform(sequence(1, length(text) - $L + 1),
                   |          i -> struct(i AS p, unhex(md5(substring(text, i, $L))) AS g))"""
                  .stripMargin)).as("x"))
              .select(col("doc_id"), col("x.p").as("p"), col("x.g").as("g")))),
          "explode+project" -> (() => q126From(
            docs.filter(length(col("text")) >= L)
              .select(col("doc_id"), col("text"),
                explode(sequence(lit(1), length(col("text")) - L + 1)).as("p"))
              .select(col("doc_id"), col("p"),
                coalesce(unhex(md5(expr(s"substring(text, p, $L)"))),
                  lit(Array.emptyByteArray)).as("g")))))
      case other => sys.error(s"unknown probe $other")
    }
    // warm both arms (JIT + codegen compile), then alternate timed runs
    arms.foreach { case (_, mk) => noop(mk()) }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to rounds; (name, mk) <- arms) {
      val t0 = System.nanoTime()
      noop(mk())
      val dt = (System.nanoTime() - t0) / 1e9
      acc(name) = dt :: acc.getOrElse(name, Nil)
      println(f"[ab] $probe $name%-18s $dt%6.2f s")
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[ab] $probe SUMMARY $n%-18s min=${ts.min}%6.2f s " +
        f"med=${ts.sorted.apply(ts.size / 2)}%6.2f s")
    }
    spark.stop()
  }
}
