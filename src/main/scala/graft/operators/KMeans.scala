package graft.operators

import graft.functions.CentroidPackedArgmin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column, in FIXED-POINT
  * arithmetic — the centroid-training pass a training-data pipeline
  * runs to build IVF coarse quantizers (see Similarity.annIvf*), to
  * cluster a corpus for diversity-balanced sampling, and to bucket
  * near-duplicate candidates.
  *
  * Why fixed point: float k-means is nondeterministic across engines,
  * partition counts and even task schedules — centroid means sum in
  * whatever order partitions arrive, and a last-ulp difference can flip
  * an argmin and cascade through later iterations. Here every component
  * is quantized once (`floor(x * scale)` as LONG) and all downstream
  * arithmetic — squared L2 distances, per-cluster sums, floor-division
  * means — is exact integer math, which is associative/commutative, so
  * the result is BIT-IDENTICAL for any cluster size, any partitioning,
  * and any engine that implements the same spec ([[kmeansSql]] replays
  * it in ANSI SQL; the q92 DuckDB oracle pins it). Reproducible
  * preprocessing is worth far more at 100 TB than the sub-quantum
  * (1e-6 per component) precision loss.
  *
  * Execution shape, per iteration:
  *  - assignment: map-only — the k×d centroid matrix rides to executors
  *    as a codegen reference object ([[CentroidPackedArgmin]], a tight
  *    `long[][]` loop inside WholeStageCodegen, no UDF);
  *  - update: one hash aggregation keyed by `cid` (k groups) with
  *    map-side partial sums — the shuffle carries k×(d+2) longs per map
  *    task, never data rows — then a k-row collect; new centroid =
  *    `floorDiv(sum, count)` per dimension, empty clusters keep their
  *    previous centroid (the SQL LEFT JOIN + coalesce).
  * The quantized input is persisted once and scanned `iterations`
  * times — standard Lloyd; at cluster scale pin it with
  * MEMORY_AND_DISK or re-read from columnar storage.
  *
  * Initialization is the k lowest-id vectors (deterministic and
  * SQL-replayable, unlike a random or kmeans|| seed). Ties in the
  * assignment argmin break toward the lowest centroid id in both
  * engines (exact-integer distances make ties well-defined).
  *
  * Overflow: distances need `d * (2*scale*maxAbs)^2 * k < 2^63`. The
  * bound is verified against the data's true max |component| measured
  * as one extra column of the update aggregation (free — same scan,
  * same shuffle); violation throws rather than returning wrapped math.
  */
object KMeans {

  final case class Model(centroids: Array[Array[Long]], scale: Long) {
    def k: Int = centroids.length
  }

  final case class Result(assignments: DataFrame, model: Model)

  /** Seed-selection strategy for [[fit]]. Both variants are fully
    * deterministic and SQL-replayable — no RNG state anywhere.
    */
  sealed trait Seeding
  object Seeding {
    /** k lowest-id vectors — O(1) extra cost, quality-blind (all k
      * seeds can land in one dense region).
      */
    case object LowestId extends Seeding

    /** Deterministic kmeans++-style D²-weighted seeding: the first seed
      * is the lowest-id vector; each subsequent ROUND scores every
      * point by `priority = D²(x) * 2^24 / (u(x)+1)` — D²(x) the exact
      * integer squared distance to the nearest already-chosen seed,
      * u(x) a content-keyed md5 uniform — and takes the top
      * `ceil(remaining/roundsLeft)` priorities. Priority sampling
      * (Duffield–Lund–Thorup, the q68 pattern) gives the
      * D²-proportional inclusion of kmeans++ without an RNG: one IEEE
      * multiply + one IEEE divide, both exactly-rounded, so Spark and
      * the SQL replay agree bit-for-bit. Batching `quota` picks per
      * round is the kmeans|| move (Bahmani et al., VLDB'12): `rounds`
      * extra passes instead of k-1. Each pass is map-only
      * (CentroidPackedArgmin) + TakeOrdered of `quota` rows.
      */
    final case class DSquaredPriority(rounds: Int = 2) extends Seeding {
      require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    }
  }

  /** Per-round pick quotas for [[Seeding.DSquaredPriority]]: spread the
    * k-1 non-initial seeds evenly, front-loaded (`ceil` then re-split).
    * Shared by the operator and the SQL generator so the replay is
    * exact.
    */
  private def seedQuotas(k: Int, rounds: Int): Seq[Int] = {
    var remaining = k - 1
    (1 to rounds).map { r =>
      val q = math.ceil(remaining.toDouble / (rounds - r + 1)).toInt
      remaining -= q
      q
    }.filter(_ > 0)
  }

  /** @param assignCols output column names (id, cluster_id, dist) —
    *        `dist` is the squared L2 distance in fixed-point units
    *        (scale²) to the assigned centroid of the LAST iteration's
    *        assignment pass (the model holds the post-update centroids).
    */
  def fit(
      df: DataFrame,
      k: Int,
      iterations: Int,
      scale: Long = 1000000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seeding: Seeding = Seeding.LowestId): Result = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = df.sparkSession

    val fixed = df.select(col(idCol).as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(scale.toDouble))).as("fv"))
      .persist()
    try {
      var cents: Array[Array[Long]] = seeding match {
        case Seeding.LowestId => seedLowestId(fixed, k)
        case Seeding.DSquaredPriority(rounds) =>
          seedDSquared(fixed, k, rounds)
      }
      require(cents.nonEmpty, "k-means needs at least one input row")
      val kk = cents.length // k clamped to the row count
      val dim = cents(0).length

      val maxAbsCol = max(aggregate(col("fv"), lit(0L),
        (acc, x) => greatest(acc, abs(x)))).as("ma")
      val aggExprs = count(lit(1)).as("cnt") +: maxAbsCol +:
        (0 until dim).map(i => sum(col("fv").getItem(i)).as(s"s$i"))

      var lastAssign: DataFrame = null
      for (i <- 1 to iterations) {
        val pack = CentroidPackedArgmin(spark, col("fv"), cents)
        val assigned = fixed.select(col("id"), col("fv"), pack.as("p"))
          .select(col("id"), col("fv"),
            (col("p") % kk).cast("int").as("cid"),
            expr(s"p DIV $kk").as("dist"))
        if (i == iterations)
          lastAssign = assigned.select(col("id").as(idCol),
            col("cid").as("cluster_id"), col("dist"))

        val rows = assigned.groupBy("cid")
          .agg(aggExprs.head, aggExprs.tail: _*).collect()
        val maxAbs = rows.map(_.getLong(2)).max
        val bound = BigInt(dim) * BigInt(2 * maxAbs).pow(2) * kk
        require(bound < BigInt(Long.MaxValue),
          s"fixed-point overflow: d=$dim, k=$kk, maxAbs=$maxAbs at " +
            s"scale=$scale exceeds 2^63 — lower `scale`")
        val next = cents.map(_.clone())
        rows.foreach { r =>
          val c = r.getInt(0); val cnt = r.getLong(1)
          var i2 = 0
          while (i2 < dim) {
            next(c)(i2) = Math.floorDiv(r.getLong(3 + i2), cnt)
            i2 += 1
          }
        }
        cents = next
      }
      Result(lastAssign, Model(cents, scale))
    } finally fixed.unpersist(blocking = false)
  }

  private def seedLowestId(fixed: DataFrame, k: Int): Array[Array[Long]] =
    fixed.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)

  /** [[Seeding.DSquaredPriority]] selection over the quantized input.
    * Cost: `rounds` map-only distance passes + TakeOrdered collects of
    * ≤ k rows each — the driver holds only the k×d seed matrix, same
    * footprint [[fit]] already requires. Points at exact distance 0
    * from a chosen seed (byte-identical vectors) are excluded, so the
    * seed set never contains duplicates; if the corpus has fewer than
    * k distinct vectors the seed set (and k) shrinks.
    */
  private def seedDSquared(fixed: DataFrame, k: Int,
                           rounds: Int): Array[Array[Long]] = {
    val spark = fixed.sparkSession
    var cents = seedLowestId(fixed, 1)
    if (cents.isEmpty) return cents
    seedQuotas(k, rounds).zipWithIndex.foreach { case (quota, r0) =>
      val r = r0 + 1
      val kk = cents.length
      val pack = CentroidPackedArgmin(spark, col("fv"), cents)
      val u = conv(substring(
        md5(concat(col("id").cast("string"), lit(s":seed$r"))), 1, 6),
        16, 10).cast("long")
      val picked = fixed
        .select(col("id"), col("fv"), pack.as("p"))
        .select(col("id"), col("fv"), expr(s"p DIV $kk").as("dist"))
        .where(col("dist") > 0)
        .select(col("id"), col("fv"),
          (col("dist").cast("double") * lit(16777216.0) / (u + lit(1L)))
            .as("priority"))
        .orderBy(desc("priority"), asc("id"))
        .limit(quota)
        .collect()
      cents = cents ++ picked.map(_.getSeq[Long](1).toArray)
    }
    cents
  }

  /** Mini-batch k-means (Sculley, WWW'10) in the same fixed-point,
    * fully deterministic regime as [[fit]]: each iteration assigns only
    * a deterministic hash-sampled subset — rows where the md5 uniform
    * keyed by (id, iteration) falls below `fraction * 2^24` — and
    * folds the batch into CUMULATIVE per-cluster sums; centroid =
    * `floorDiv(S_c, N_c)` over every point the cluster has absorbed so
    * far (the running-mean form of Sculley's per-point 1/n_c learning
    * rate, batched). A cluster that has absorbed nothing keeps its
    * seed. After the sampled iterations, one full map-only pass
    * assigns every row against the final model.
    *
    * Why: full Lloyd scans the corpus `iterations` times; at 100 TB the
    * scan IS the cost. Mini-batch cuts per-iteration cost to
    * `fraction` of the scan with near-identical converged centroids on
    * typical corpora. Per-iteration sample membership is re-keyed by
    * iteration (`:mb$i`), so iterations see different subsets — no RNG,
    * no `sample()` (whose output depends on partitioning), stable
    * under repartition and engine replay ([[minibatchSql]], q98).
    *
    * The cumulative-sum magnitudes are checked to stay below 2^52:
    * above that, `floor(CAST(s AS DOUBLE)/n)` in the SQL replay could
    * diverge from exact `floorDiv` (double rounding crosses the
    * integer boundary only when |s| ≥ 2^52); violation throws rather
    * than silently degrading the replay guarantee.
    */
  def fitMiniBatch(
      df: DataFrame,
      k: Int,
      iterations: Int,
      fraction: Double,
      scale: Long = 1000000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seeding: Seeding = Seeding.LowestId): Result = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val spark = df.sparkSession
    val thresh = mbThreshold(fraction)

    val fixed = df.select(col(idCol).as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(scale.toDouble))).as("fv"))
      .persist()
    try {
      val seedCents: Array[Array[Long]] = seeding match {
        case Seeding.LowestId => seedLowestId(fixed, k)
        case Seeding.DSquaredPriority(rounds) =>
          seedDSquared(fixed, k, rounds)
      }
      require(seedCents.nonEmpty, "k-means needs at least one input row")
      val kk = seedCents.length
      val dim = seedCents(0).length
      var cents = seedCents.map(_.clone())
      val accS = Array.fill(kk)(Array.fill(dim)(0L))
      val accN = Array.fill(kk)(0L)
      var runMaxAbs = seedCents.map(_.map(math.abs).max).max

      val maxAbsCol = max(aggregate(col("fv"), lit(0L),
        (acc, x) => greatest(acc, abs(x)))).as("ma")
      val aggExprs = count(lit(1)).as("cnt") +: maxAbsCol +:
        (0 until dim).map(i => sum(col("fv").getItem(i)).as(s"s$i"))

      for (i <- 1 to iterations) {
        val u = conv(substring(
          md5(concat(col("id").cast("string"), lit(s":mb$i"))), 1, 6),
          16, 10).cast("long")
        val pack = CentroidPackedArgmin(spark, col("fv"), cents)
        val rows = fixed.where(u < lit(thresh))
          .select(col("fv"), pack.as("p"))
          .select(col("fv"), (col("p") % kk).cast("int").as("cid"))
          .groupBy("cid").agg(aggExprs.head, aggExprs.tail: _*)
          .collect()
        if (rows.nonEmpty)
          runMaxAbs = math.max(runMaxAbs, rows.map(_.getLong(2)).max)
        val bound = BigInt(dim) * BigInt(2 * runMaxAbs).pow(2) * kk
        require(bound < BigInt(Long.MaxValue),
          s"fixed-point overflow: d=$dim, k=$kk, maxAbs=$runMaxAbs at " +
            s"scale=$scale exceeds 2^63 — lower `scale`")
        rows.foreach { r =>
          val c = r.getInt(0)
          accN(c) += r.getLong(1)
          var d = 0
          while (d < dim) {
            accS(c)(d) += r.getLong(3 + d)
            require(math.abs(accS(c)(d)) < (1L << 52),
              s"cumulative sum |S($c)($d)| reached 2^52 — the SQL " +
                "double-floor replay would no longer be exact; lower `scale`")
            d += 1
          }
        }
        cents = Array.tabulate(kk)(c => Array.tabulate(dim)(d =>
          if (accN(c) > 0) Math.floorDiv(accS(c)(d), accN(c))
          else seedCents(c)(d)))
      }

      val pack = CentroidPackedArgmin(spark, col("fv"), cents)
      val lastAssign = fixed.select(col("id"), pack.as("p"))
        .select(col("id").as(idCol),
          (col("p") % kk).cast("int").as("cluster_id"),
          expr(s"p DIV $kk").as("dist"))
      Result(lastAssign, Model(cents, scale))
    } finally fixed.unpersist(blocking = false)
  }

  /** Sample-inclusion threshold shared by [[fitMiniBatch]] and
    * [[minibatchSql]]: a row is in iteration i's batch iff its 24-bit
    * md5 uniform is strictly below this.
    */
  private def mbThreshold(fraction: Double): Long =
    math.floor(fraction * 16777216.0).toLong

  /** Assignment-only pass against a trained model (e.g. routing query
    * vectors to IVF lists): map-only, no shuffle.
    */
  /** Like [[assign]] but APPENDS the cluster id to the input's columns
    * instead of projecting to (id, cluster, dist) — so an index build
    * that needs (all original columns + cluster) never pays the
    * corpus ⋈ corpus self-join to reattach them. Map-only, same codegen
    * argmin; at 100 TB this is the difference between tagging the
    * inverted lists in one scan and shuffling the corpus twice.
    */
  def withCluster(df: DataFrame, model: Model, vecCol: String = "embedding",
                  outCol: String = "cluster"): DataFrame = {
    val spark = df.sparkSession
    val kk = model.k
    val fv: Column = transform(col(vecCol),
      x => floor(x.cast("double") * lit(model.scale.toDouble)))
    df.withColumn(outCol,
      (CentroidPackedArgmin(spark, fv, model.centroids) % kk).cast("int"))
  }

  def assign(df: DataFrame, model: Model, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val kk = model.k
    val fv: Column = transform(col(vecCol),
      x => floor(x.cast("double") * lit(model.scale.toDouble)))
    df.select(col(idCol), fv.as("fv"))
      .select(col(idCol),
        CentroidPackedArgmin(spark, col("fv"), model.centroids).as("p"))
      .select(col(idCol), (col("p") % kk).cast("int").as("cluster_id"),
        expr(s"p DIV $kk").as("dist"))
  }

  /** ANSI-SQL replay of [[fit]]'s final assignment with the iterations
    * (and, for [[Seeding.DSquaredPriority]], the seed rounds) UNROLLED
    * as chained CTEs (the [[PageRank.pagerankSql]] pattern). Yields
    * columns (<id>, cluster_id, dist) unordered; the caller appends
    * ORDER BY. `table(id, vec)` must hold a float-array column.
    */
  def kmeansSql(table: String, id: String, vec: String,
                k: Int, iterations: Int, scale: Long = 1000000L,
                seeding: Seeding = Seeding.LowestId): String =
    kmeansChainSql(table, id, vec, k, iterations, scale, seeding) +
      s"""
         |SELECT $id, cid AS cluster_id, CAST(dist AS BIGINT) AS dist
         |FROM a$iterations""".stripMargin

  /** Like [[kmeansSql]] but yields the POST-update centroids of the
    * last iteration — `(cid, d, v)` in fixed-point units — i.e. what
    * [[fit]] returns as `Model.centroids`. Used by oracles that replay
    * a consumer of the trained model (q34's IVF probe ranking).
    */
  def kmeansCentroidsSql(table: String, id: String, vec: String,
                         k: Int, iterations: Int, scale: Long = 1000000L,
                         seeding: Seeding = Seeding.LowestId): String =
    kmeansChainSql(table, id, vec, k, iterations, scale, seeding) +
      s"\nSELECT cid, d, v FROM c$iterations"

  /** The shared `WITH fx …, c0 …, a1/c1 … a<n>/c<n>` CTE chain (no
    * final SELECT). */
  private def kmeansChainSql(table: String, id: String, vec: String,
                             k: Int, iterations: Int, scale: Long,
                             seeding: Seeding): String = {
    val iters = (1 to iterations).map { i =>
      s"""a$i AS (
         | SELECT $id, cid, dist FROM (
         |   SELECT $id, cid, dist,
         |     row_number() OVER (PARTITION BY $id ORDER BY dist, cid) AS rn
         |   FROM (SELECT f.$id, c.cid, SUM((f.v - c.v)*(f.v - c.v)) AS dist
         |         FROM fx f JOIN c${i - 1} c ON f.d = c.d
         |         GROUP BY f.$id, c.cid) dd) r WHERE rn = 1),
         |c$i AS (
         | SELECT p.cid, p.d,
         |   coalesce(CAST(floor(CAST(s.sv AS DOUBLE) / s.cnt) AS BIGINT), p.v) AS v
         | FROM c${i - 1} p
         | LEFT JOIN (SELECT a.cid, f.d, SUM(f.v) AS sv, COUNT(*) AS cnt
         |            FROM a$i a JOIN fx f ON a.$id = f.$id
         |            GROUP BY a.cid, f.d) s ON s.cid = p.cid AND s.d = p.d)"""
        .stripMargin
    }.mkString(",\n")
    val seedCtes = seedSql(table, id, k, seeding)
    s"""WITH fx AS (
       | SELECT $id, CAST(d AS INTEGER) AS d,
       |   CAST(floor(CAST($vec[d] AS DOUBLE) * $scale) AS BIGINT) AS v
       | FROM $table, unnest(range(1, len($vec) + 1)) AS t(d)),
       |$seedCtes,
       |$iters""".stripMargin
  }

  /** The `c0` seed-centroid CTE chain (assumes a preceding `fx` CTE),
    * shared by [[kmeansSql]] and [[minibatchSql]].
    */
  private def seedSql(table: String, id: String, k: Int,
                      seeding: Seeding): String =
    seeding match {
      case Seeding.LowestId =>
        s"""init AS (SELECT $id FROM $table ORDER BY $id LIMIT $k),
           |c0 AS (
           | SELECT CAST(dense_rank() OVER (ORDER BY $id) - 1 AS INTEGER) AS cid, d, v
           | FROM fx WHERE $id IN (SELECT $id FROM init))""".stripMargin
      case Seeding.DSquaredPriority(rounds) =>
        val quotas = seedQuotas(k, rounds)
        var offset = 1
        val roundCtes = quotas.zipWithIndex.map { case (q, r0) =>
          val r = r0 + 1
          val cte =
            s"""sd$r AS (
               | SELECT sid, MIN(dd) AS dist FROM (
               |   SELECT f.$id AS sid, c.cid, SUM((f.v - c.v)*(f.v - c.v)) AS dd
               |   FROM fx f JOIN s${r - 1} c ON f.d = c.d
               |   GROUP BY f.$id, c.cid) t GROUP BY sid),
               |sp$r AS (
               | SELECT sid, CAST(dist AS DOUBLE) * 16777216.0
               |   / (('0x' || substr(md5(sid::VARCHAR || ':seed$r'), 1, 6))::BIGINT + 1)
               |   AS priority
               | FROM sd$r WHERE dist > 0
               | ORDER BY priority DESC, sid LIMIT $q),
               |sr$r AS (
               | SELECT sid, CAST($offset + row_number() OVER (ORDER BY priority DESC, sid) - 1
               |   AS INTEGER) AS cid
               | FROM sp$r),
               |sn$r AS (
               | SELECT r.cid, f.d, f.v FROM sr$r r JOIN fx f ON f.$id = r.sid),
               |s$r AS (SELECT cid, d, v FROM s${r - 1}
               |        UNION ALL SELECT cid, d, v FROM sn$r)""".stripMargin
          offset += q
          cte
        }.mkString(",\n")
        s"""s0 AS (
           | SELECT CAST(0 AS INTEGER) AS cid, d, v FROM fx
           | WHERE $id = (SELECT min($id) FROM $table)),
           |$roundCtes,
           |c0 AS (SELECT cid, d, v FROM s${quotas.length})""".stripMargin
    }

  /** ANSI-SQL replay of [[fitMiniBatch]]: seed CTEs, then per iteration
    * a sampled-membership CTE, a min-dist assignment, batch sums, a
    * CUMULATIVE state fold (`g_i`), and the recomputed centroids
    * (`c_i`); finally one unsampled assignment pass against the last
    * centroids. Yields (<id>, cluster_id, dist) unordered.
    */
  def minibatchSql(table: String, id: String, vec: String,
                   k: Int, iterations: Int, fraction: Double,
                   scale: Long = 1000000L,
                   seeding: Seeding = Seeding.LowestId): String = {
    val thresh = mbThreshold(fraction)
    val iters = (1 to iterations).map { i =>
      s"""m$i AS (
         | SELECT $id AS mid FROM $table
         | WHERE (('0x' || substr(md5($id::VARCHAR || ':mb$i'), 1, 6))::BIGINT) < $thresh),
         |a$i AS (
         | SELECT sid, cid FROM (
         |   SELECT sid, cid,
         |     row_number() OVER (PARTITION BY sid ORDER BY dist, cid) AS rn
         |   FROM (SELECT f.$id AS sid, c.cid, SUM((f.v - c.v)*(f.v - c.v)) AS dist
         |         FROM fx f JOIN m$i ON f.$id = m$i.mid
         |         JOIN c${i - 1} c ON f.d = c.d
         |         GROUP BY f.$id, c.cid) dd) r WHERE rn = 1),
         |t$i AS (
         | SELECT a.cid, f.d, SUM(f.v) AS sv, COUNT(*) AS cnt
         | FROM a$i a JOIN fx f ON a.sid = f.$id GROUP BY a.cid, f.d),
         |g$i AS (
         | SELECT g.cid, g.d, g.s + coalesce(t.sv, 0) AS s,
         |        g.n + coalesce(t.cnt, 0) AS n
         | FROM g${i - 1} g LEFT JOIN t$i t ON t.cid = g.cid AND t.d = g.d),
         |c$i AS (
         | SELECT g.cid, g.d,
         |   CASE WHEN g.n > 0 THEN CAST(floor(CAST(g.s AS DOUBLE) / g.n) AS BIGINT)
         |        ELSE c0.v END AS v
         | FROM g$i g JOIN c0 ON c0.cid = g.cid AND c0.d = g.d)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH fx AS (
       | SELECT $id, CAST(d AS INTEGER) AS d,
       |   CAST(floor(CAST($vec[d] AS DOUBLE) * $scale) AS BIGINT) AS v
       | FROM $table, unnest(range(1, len($vec) + 1)) AS t(d)),
       |${seedSql(table, id, k, seeding)},
       |g0 AS (SELECT cid, d, CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS n FROM c0),
       |$iters
       |SELECT $id, cid AS cluster_id, CAST(dist AS BIGINT) AS dist FROM (
       | SELECT $id, cid, dist,
       |   row_number() OVER (PARTITION BY $id ORDER BY dist, cid) AS rn
       | FROM (SELECT f.$id, c.cid, SUM((f.v - c.v)*(f.v - c.v)) AS dist
       |       FROM fx f JOIN c$iterations c ON f.d = c.d
       |       GROUP BY f.$id, c.cid) dd) r WHERE rn = 1""".stripMargin
  }
}
