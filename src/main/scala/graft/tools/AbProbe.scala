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
      case "q110" =>
        // r18: degree/adjacency attach JOINS (the r17 form, inlined) vs
        // the message-passing two-aggregation form now in
        // operators.Triangles — same canon edge pipeline both arms.
        import org.apache.spark.sql.DataFrame
        def edgesOld(): DataFrame = graft.Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_partkey")
          .groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("p"))
          .filter(size(col("p")) >= 2)
          .select(explode(expr(
            """flatten(transform(sequence(0, size(p) - 2),
              |  i -> transform(sequence(i + 1, size(p) - 1),
              |       j -> struct(p[i] AS u, p[j] AS v))))""".stripMargin)).as("e"))
          .select(col("e.u").as("u"), col("e.v").as("v"))
        def oldTriangles(edges: DataFrame): DataFrame = {
          val canon = edges
            .select(least(col("u"), col("v")).as("lo"), greatest(col("u"), col("v")).as("hi"))
            .filter(col("lo") =!= col("hi")).distinct()
          val deg = canon.select(col("lo").as("node"))
            .union(canon.select(col("hi").as("node")))
            .groupBy("node").agg(count(lit(1)).as("deg"))
          val withDeg = canon
            .join(deg.withColumnRenamed("node", "lo").withColumnRenamed("deg", "dlo"), "lo")
            .join(deg.withColumnRenamed("node", "hi").withColumnRenamed("deg", "dhi"), "hi")
          val srcIsLo = col("dlo") < col("dhi") ||
            (col("dlo") === col("dhi") && col("lo") < col("hi"))
          val oriented = withDeg.select(
            when(srcIsLo, col("lo")).otherwise(col("hi")).as("src"),
            when(srcIsLo, col("hi")).otherwise(col("lo")).as("dst"))
          val adjSide = oriented.groupBy(col("src").as("node"))
            .agg(collect_list(col("dst")).as("nbrs"))
          val withLists = oriented
            .join(adjSide.select(col("node").as("src"), col("nbrs").as("la")), Seq("src"))
            .join(adjSide.select(col("node").as("dst"), col("nbrs").as("lb")), Seq("dst"))
            .select(col("src"), col("dst"),
              array_intersect(col("la"), col("lb")).as("common"))
            .filter(size(col("common")) > 0)
          withLists
            .select(explode(concat(
              array(
                struct(col("src").as("node"), size(col("common")).cast("long").as("c")),
                struct(col("dst").as("node"), size(col("common")).cast("long").as("c"))),
              transform(col("common"), w => struct(w.as("node"), lit(1L).as("c")))))
              .as("e"))
            .groupBy(col("e.node").as("node")).agg(sum(col("e.c")).as("n_tri"))
            .orderBy("node")
        }
        Seq(
          "joins+hof-pairs" -> (() => oldTriangles(edgesOld())),
          "message-passing" -> (() =>
            graft.SparkEntry.queries("q110_triangle_count")(spark, sfDir)))
      case "q149" =>
        // r18: (doc_id, n) rollup + pivot (the former form, inlined over
        // the SAME gram pipeline) vs the fused doc-keyed conditional
        // aggregation now in TextQueries.q149.
        import org.apache.spark.sql.{Column, DataFrame}
        def q149Old(): DataFrame = {
          val toks = graft.Tables.documents(spark, sfDir)
            .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("w"))
          val grams = toks
            .select(col("doc_id"), explode(lit(Array(3, 4, 5, 10))).as("n"), col("w"))
            .filter(size(col("w")) >= col("n"))
            .select(col("doc_id"), col("n"), col("w"),
              explode(sequence(lit(1), size(col("w")) - col("n") + 1)).as("i"))
            .select(col("doc_id"), col("n"),
              array_join(slice(col("w"), col("i"), col("n")), " ").as("g"))
            .groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
          val perN = grams.groupBy("doc_id", "n")
            .agg(sum("c").as("tot"), count(lit(1)).as("dis"),
              min(struct((-col("c")).as("nc"), col("g"))).as("m"))
            .select(col("doc_id"), col("n"), col("tot"), col("dis"),
              (-col("m.nc")).as("topc"), length(col("m.g")).cast("long").as("topl"))
          val wide = perN.groupBy("doc_id").pivot("n", Seq(3, 4, 5, 10))
            .agg(first("tot").as("tot"), first("dis").as("dis"),
              first("topc").as("topc"), first("topl").as("topl"))
          val chars = toks.select(col("doc_id"),
            length(concat_ws(" ", col("w"))).cast("long").as("nch"))
          def frac(num: Column, den: Column): Column =
            round(coalesce(num.cast("double") / den.cast("double"), lit(0.0)), 4)
          chars.join(wide, Seq("doc_id"), "left")
            .select(col("doc_id"),
              frac(col("3_topc") * col("3_topl"), col("nch")).as("top3_frac"),
              frac(col("4_topc") * col("4_topl"), col("nch")).as("top4_frac"),
              frac(col("5_tot") - col("5_dis"), col("5_tot")).as("dup5_frac"),
              frac(col("10_tot") - col("10_dis"), col("10_tot")).as("dup10_frac"))
            .withColumn("gopher_ok",
              col("top3_frac") <= 0.18 && col("top4_frac") <= 0.16 &&
                col("dup5_frac") <= 0.30 && col("dup10_frac") <= 0.10)
            .orderBy("doc_id")
        }
        Seq(
          "rollup+pivot" -> (() => q149Old()),
          "fused-cond-agg" -> (() =>
            graft.SparkEntry.queries("q149_gopher_repetition")(spark, sfDir)))
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
