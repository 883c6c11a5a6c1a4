package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Pure-Scala replay of the fixed-point Lloyd spec — independent of
    * the Spark implementation, so drift in either shows up here (the
    * DuckDB oracle is the third replica, via q92's t2 gate).
    */
  private def reference(
      data: Seq[(Long, Seq[Float])], k: Int, iterations: Int,
      scale: Long, init: Seq[Array[Long]] = Nil): Map[Long, (Int, Long)] = {
    val fx = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong).toArray
    }.sortBy(_._1)
    var cents =
      if (init.nonEmpty) init else fx.take(k).map(_._2.map(identity))
    var out = Map.empty[Long, (Int, Long)]
    for (_ <- 1 to iterations) {
      val assigned = fx.map { case (id, v) =>
        val best = cents.zipWithIndex.map { case (c, ci) =>
          val d2 = v.zip(c).map { case (a, b) =>
            (a - b) * (a - b) }.sum
          (d2, ci)
        }.min
        (id, best._2, best._1)
      }
      out = assigned.map(a => a._1 -> (a._2, a._3)).toMap
      cents = cents.zipWithIndex.map { case (old, ci) =>
        val members = assigned.filter(_._2 == ci).map(_._1).toSet
        if (members.isEmpty) old
        else {
          val vecs = fx.filter(f => members(f._1)).map(_._2)
          old.indices.map { d =>
            Math.floorDiv(vecs.map(_(d)).sum, vecs.size.toLong)
          }.toArray
        }
      }
    }
    out
  }

  private def loadRaw(): Seq[(Long, Seq[Float])] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

  test("fit matches the independent fixed-point reference exactly") {
    val res = KMeans.fit(Tables.embeddings(spark, dir), k = 8, iterations = 3)
    val got = res.assignments.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val want = reference(loadRaw(), k = 8, iterations = 3, scale = 1000000L)
    assert(got.size == want.size)
    assert(got == want)
    assert(got.values.map(_._1).toSet.subsetOf((0 until 8).toSet))
  }

  test("result is identical under a different partitioning (exact integer sums)") {
    val base = Tables.embeddings(spark, dir)
    val a = KMeans.fit(base, k = 5, iterations = 2).assignments
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val b = KMeans.fit(base.repartition(17, col("vec_id")), k = 5, iterations = 2)
      .assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("empty clusters keep their previous centroids; ties go to the lowest cid") {
    import spark.implicits._
    // All points identical: everything assigns to cid 0 (tie-break),
    // clusters 1..k-1 stay empty and must keep their init centroid.
    val df = (0L until 20L).map(i => (i, Seq.fill(4)(0.25f)))
      .toDF("vec_id", "embedding")
    val res = KMeans.fit(df, k = 3, iterations = 2)
    val rows = res.assignments.collect()
    assert(rows.forall(_.getInt(1) == 0))
    assert(rows.forall(_.getLong(2) == 0L))
    assert(res.model.centroids.length == 3)
    res.model.centroids.foreach(c =>
      assert(c.sameElements(Array.fill(4)(250000L))))
  }

  test("assignment pass is UDF-free and stays inside codegen") {
    val res = KMeans.fit(Tables.embeddings(spark, dir), k = 4, iterations = 1)
    val plan = res.assignments.queryExecution.executedPlan.toString
    assert(plan.contains("graft_centroid_packed_argmin"), plan)
    assert(!plan.contains("UDF"), s"Scala UDF leaked into the plan:\n$plan")
  }

  /** Independent replica of the D²-priority seed selection. */
  private def seedRef(data: Seq[(Long, Seq[Float])], k: Int, rounds: Int,
                      scale: Long): Seq[Array[Long]] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fx = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong).toArray
    }.sortBy(_._1)
    var cents: Seq[Array[Long]] = fx.take(1).map(_._2)
    var remaining = k - 1
    for (r <- 1 to rounds if remaining > 0) {
      val quota = math.ceil(remaining.toDouble / (rounds - r + 1)).toInt
      val picked = fx.map { case (id, v) =>
        val d2 = cents.map(c => v.zip(c).map { case (a, b) =>
          (a - b) * (a - b) }.sum).min
        (id, v, d2)
      }.filter(_._3 > 0).map { case (id, v, d2) =>
        val u = java.lang.Long.parseLong(
          md5hex(s"$id:seed$r").take(6), 16)
        (id, v, d2.toDouble * 16777216.0 / (u + 1))
      }.sortBy { case (id, _, p) => (-p, id) }.take(quota)
      cents = cents ++ picked.map(_._2)
      remaining -= picked.size
    }
    cents
  }

  test("D²-priority seeding matches the independent replica end-to-end") {
    val raw = loadRaw()
    val res = KMeans.fit(Tables.embeddings(spark, dir), k = 8,
      iterations = 2, seeding = KMeans.Seeding.DSquaredPriority(rounds = 2))
    val got = res.assignments.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val seeds = seedRef(raw, k = 8, rounds = 2, scale = 1000000L)
    assert(seeds.length == 8)
    val want = reference(raw, k = 8, iterations = 2, scale = 1000000L,
      init = seeds)
    assert(got == want)
  }

  test("seeded fit is identical under a different partitioning") {
    val base = Tables.embeddings(spark, dir)
    val s = KMeans.Seeding.DSquaredPriority(rounds = 2)
    val a = KMeans.fit(base, k = 6, iterations = 2, seeding = s).assignments
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val b = KMeans.fit(base.repartition(17, col("vec_id")), k = 6,
      iterations = 2, seeding = s).assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("D² seeding beats lowest-id init when the lowest ids are co-located") {
    import spark.implicits._
    // Three tight, well-separated blobs; the k lowest ids are IDENTICAL
    // vectors inside blob A, so lowest-id init collapses every centroid
    // onto one point (ties all go to cid 0 and never escape), while the
    // D²-weighted seeds must land in the far blobs (their priorities
    // dominate: D² ~ 1e12 vs intra-blob ~ 1e8).
    def blob(ids: Range, base: Float): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong, Seq.tabulate(4)(d =>
        base + 0.001f * ((i * 7 + d * 3) % 5))))
    val data = blob(0 to 9, 0.10f).map { case (id, _) =>
      (id, Seq.fill(4)(0.10f)) } ++ // exact duplicates: ids 0..9
      blob(10 to 19, 0.50f) ++ blob(20 to 29, 0.90f)
    val df = data.toDF("vec_id", "embedding")
    def cost(seeding: KMeans.Seeding): Long =
      KMeans.fit(df, k = 3, iterations = 2, seeding = seeding)
        .assignments.agg(sum("dist")).collect()(0).getLong(0)
    val lowest = cost(KMeans.Seeding.LowestId)
    val seeded = cost(KMeans.Seeding.DSquaredPriority(rounds = 2))
    assert(seeded < lowest,
      s"seeded cost $seeded should beat lowest-id cost $lowest")
    // and the seed set contains no duplicate centroids
    val m = KMeans.fit(df, k = 3, iterations = 1,
      seeding = KMeans.Seeding.DSquaredPriority(rounds = 2)).model
    assert(m.centroids.map(_.toSeq).distinct.length == m.centroids.length)
  }

  /** Independent replica of the mini-batch fit (cumulative-sum form). */
  private def minibatchRef(data: Seq[(Long, Seq[Float])], k: Int,
                           iterations: Int, fraction: Double,
                           scale: Long): Map[Long, (Int, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val thresh = math.floor(fraction * 16777216.0).toLong
    val fx = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong).toArray
    }.sortBy(_._1)
    val seeds = fx.take(k).map(_._2)
    val kk = seeds.length
    val dim = seeds.head.length
    var cents = seeds.map(_.clone())
    val s = Array.fill(kk)(Array.fill(dim)(0L))
    val n = Array.fill(kk)(0L)
    def nearest(v: Array[Long]): (Int, Long) =
      cents.zipWithIndex.map { case (c, ci) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, ci)
      }.min.swap
    for (i <- 1 to iterations) {
      val batch = fx.filter { case (id, _) =>
        java.lang.Long.parseLong(md5hex(s"$id:mb$i").take(6), 16) < thresh }
      batch.foreach { case (_, v) =>
        val (ci, _) = nearest(v)
        n(ci) += 1
        v.indices.foreach(d => s(ci)(d) += v(d))
      }
      cents = Array.tabulate(kk)(c => Array.tabulate(dim)(d =>
        if (n(c) > 0) Math.floorDiv(s(c)(d), n(c)) else seeds(c)(d)))
    }
    fx.map { case (id, v) =>
      val (ci, d2) = nearest(v); id -> (ci, d2)
    }.toMap
  }

  test("mini-batch fit matches the independent cumulative-sum replica") {
    val raw = loadRaw()
    val res = KMeans.fitMiniBatch(Tables.embeddings(spark, dir), k = 8,
      iterations = 3, fraction = 0.5)
    val got = res.assignments.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val want = minibatchRef(raw, k = 8, iterations = 3, fraction = 0.5,
      scale = 1000000L)
    assert(got == want)
  }

  test("mini-batch fit is identical under a different partitioning") {
    val base = Tables.embeddings(spark, dir)
    val a = KMeans.fitMiniBatch(base, k = 5, iterations = 2, fraction = 0.4)
      .assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val b = KMeans.fitMiniBatch(base.repartition(17, col("vec_id")), k = 5,
      iterations = 2, fraction = 0.4).assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("mini-batch converges near full Lloyd's cost on the same data") {
    val base = Tables.embeddings(spark, dir)
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum("dist")).collect()(0).getLong(0).toDouble
    val full = total(KMeans.fit(base, k = 8, iterations = 3).assignments)
    val mini = total(KMeans.fitMiniBatch(base, k = 8, iterations = 3,
      fraction = 0.5).assignments)
    // Half-corpus batches should land within 10% of full Lloyd's
    // within-cluster cost after the same number of iterations.
    assert(mini <= full * 1.10,
      s"mini-batch cost $mini vs full Lloyd $full exceeds the 10% band")
  }

  test("assign routes every vector to a valid cluster, map-only") {
    val emb = Tables.embeddings(spark, dir)
    val model = KMeans.fit(emb, k = 6, iterations = 2).model
    val out = KMeans.assign(emb, model)
    assert(out.queryExecution.executedPlan.toString.indexOf("Exchange") < 0)
    val cids = out.select("cluster_id").distinct().collect().map(_.getInt(0))
    assert(cids.forall(c => c >= 0 && c < 6))
    assert(out.count() == emb.count())
  }
}
