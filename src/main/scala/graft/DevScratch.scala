package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch measurement runner for local iteration (not part of the
  * driver contract).
  *
  * Current probe (r18 session 3): decompose q109's and q119's ~6 s
  * walls at sf0.1 — both are small-row (150 K orders) queries whose
  * per-pass samples are stable, so SOMETHING structural (Expand
  * volume? string casts? stage count? window serialization?) is the
  * cost. Alternating arms, 3 rounds, min/med reported.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val orders = () => Tables.orders(spark, sfDir)
      .withColumn("o_price", col("o_totalprice").cast(DecimalType(18, 2)))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
      "o_orderpriority", "o_price")

    val arms: Seq[(String, () => Unit)] = Seq(
      "q109-full" -> (() =>
        noop(graft.operators.Profile.profile(orders(), cols))),
      "q109-agg-only" -> (() => {
        val df = orders()
        val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
          Seq(count(col(c)).as(s"__nn_$c"),
            countDistinct(col(c)).as(s"__nd_$c"),
            min(col(c)).cast("string").as(s"__mn_$c"),
            max(col(c)).cast("string").as(s"__mx_$c"),
            avg(length(col(c).cast("string"))).as(s"__al_$c"))
        }
        noop(df.agg(aggs.head, aggs.tail: _*))
      }),
      "q109-no-distinct" -> (() => {
        val df = orders()
        val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
          Seq(count(col(c)).as(s"__nn_$c"),
            min(col(c)).cast("string").as(s"__mn_$c"),
            max(col(c)).cast("string").as(s"__mx_$c"),
            avg(length(col(c).cast("string"))).as(s"__al_$c"))
        }
        noop(df.agg(aggs.head, aggs.tail: _*))
      }),
      "q109-distinct-only" -> (() => {
        val df = orders()
        val aggs = cols.map(c => countDistinct(col(c)).as(s"__nd_$c"))
        noop(df.agg(aggs.head, aggs.tail: _*))
      }),
      "q109-approx" -> (() =>
        noop(graft.operators.Profile.profile(orders(), cols, exact = false))),
      "q109-prelen" -> (() => {
        // pre-project the per-row length(cast) chains so the Expand
        // duplicates a ready int column, not the expression
        val df0 = orders()
        val df = cols.foldLeft(df0)((d, c) =>
          d.withColumn(s"__len_$c", length(col(c).cast("string"))))
        val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
          Seq(count(col(c)).as(s"__nn_$c"),
            countDistinct(col(c)).as(s"__nd_$c"),
            min(col(c)).cast("string").as(s"__mn_$c"),
            max(col(c)).cast("string").as(s"__mx_$c"),
            avg(col(s"__len_$c")).as(s"__al_$c"))
        }
        noop(df.agg(aggs.head, aggs.tail: _*))
      }),
      "q109-split2" -> (() => {
        // two aggs (non-distinct + distinct-only) combined by crossJoin
        val df = orders()
        val nd = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
          Seq(count(col(c)).as(s"__nn_$c"),
            min(col(c)).cast("string").as(s"__mn_$c"),
            max(col(c)).cast("string").as(s"__mx_$c"),
            avg(length(col(c).cast("string"))).as(s"__al_$c"))
        }
        val dd = cols.map(c => countDistinct(col(c)).as(s"__nd_$c"))
        noop(df.agg(nd.head, nd.tail: _*)
          .crossJoin(df.agg(dd.head, dd.tail: _*)))
      }),
      "q119-full" -> (() =>
        noop(graft.queries.RelationalQueries.q119(spark, sfDir))),
      "q119-freq-only" -> (() =>
        noop(orders().groupBy(col("o_orderpriority"), col("o_price").as("__v"))
          .agg(count(lit(1)).as("__c")))),
      "q119-freq-ckpt" -> (() => {
        // q119's shape with freq (and dev) checkpointed: does cutting
        // the recomputation of the base agg pay?
        val o = orders().select(col("o_orderpriority").as("g"),
          col("o_price").as("__v"))
        val freq = o.groupBy(col("g"), col("__v"))
          .agg(count(lit(1)).as("__c")).localCheckpoint()
        val totals = freq.groupBy("g").agg(sum("__c").as("n"))
        val rank = expr("(n + 1) div 2")
        val cum = org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("__v")
          .rowsBetween(Long.MinValue, 0)
        val med = freq.withColumn("__cum", sum("__c").over(cum))
          .join(broadcast(totals), "g")
          .filter(col("__cum") >= rank)
          .groupBy("g").agg(min("__v").as("median"))
        val dev = freq.join(broadcast(med), "g")
          .groupBy(col("g"), abs(col("__v") - col("median")).as("__d"))
          .agg(sum("__c").as("__c")).localCheckpoint()
        val cumD = org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("__d")
          .rowsBetween(Long.MinValue, 0)
        val mad = dev.withColumn("__cum", sum("__c").over(cumD))
          .join(broadcast(totals), "g")
          .filter(col("__cum") >= rank)
          .groupBy("g").agg(min("__d").as("mad"))
        val outliers = dev.join(broadcast(mad), "g")
          .groupBy("g")
          .agg(sum(when(col("__d") > col("mad") * 3, col("__c"))
            .otherwise(0L)).as("n_outliers"))
        noop(totals.join(med, "g").join(mad, "g").join(outliers, "g")
          .orderBy("g"))
      }),
    )

    val docsT = () => Tables.documents(spark, sfDir)
    def posTable() = {
      val L = 40
      docsT().filter(length(col("text")) >= L)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")) - L + 1)).as("p"))
        .select(col("doc_id"), col("p"),
          coalesce(unhex(md5(expr(s"substring(text, p, $L)"))),
            lit(Array.emptyByteArray)).as("g"))
    }
    val arms2: Seq[(String, () => Unit)] = Seq(
      "q127-canon-struct" -> (() =>
        noop(posTable().groupBy("g")
          .agg(min(struct(col("doc_id"), col("p"))).as("first"),
            count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select(col("g"), col("first.doc_id").as("f_doc"),
            col("first.p").as("f_p")))),
      "q127-canon-packed" -> (() =>
        noop(posTable().groupBy("g")
          .agg(min(col("doc_id") * 4096L + col("p")).as("first"),
            count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select(col("g"), expr("first div 4096").as("f_doc"),
            (col("first") % 4096L).as("f_p")))),
      "q127-full" -> (() =>
        noop(graft.queries.CorpusQueries.q127(spark, sfDir))),
    )

    val rounds = 3
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to rounds; (name, fn) <- arms2) {
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      samples(name) ::= dt
      println(f"[scratch] round=$r $name%-18s $dt%6.2f s")
    }
    println("[scratch] --- min / med ---")
    arms2.foreach { case (name, _) =>
      val s = samples(name).sorted
      println(f"[scratch] $name%-18s min=${s.head}%6.2f med=${s(s.size / 2)}%6.2f")
    }
    val _ = arms
    spark.stop()
  }
}
