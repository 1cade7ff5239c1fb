package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vec_dist_sq

/** K-means clustering over the embedding corpus (E6) — Lloyd's
  * algorithm with deterministic init, the bulk-assignment workhorse
  * behind corpus bucketing / diversity sampling in training-data
  * pipelines.
  *
  * Scale design (the MLlib layout): centroids are the MODEL — k×dim
  * doubles — and live on the driver between iterations, shipped into
  * the assignment plan as literals evaluated by the native codegen'd
  * [[graft.functions.FloatVecDistSq]] kernel (no crossJoin row
  * explosion, no UDF). Each iteration is then ONE distributed pass:
  * assignment is map-side-only, and the centroid update is a single
  * (cluster, dim)-keyed aggregate of posexploded vectors. Everything is
  * deterministic: init = the k lowest vec_ids, argmin ties break to the
  * lowest cluster, and per-dim means are quantized to 6 decimals each
  * round so both engines (and any partial-aggregation order) agree on
  * the model bit-for-bit.
  */
object Clustering {

  val K = 4
  val Iters = 3

  private def assign(emb: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    val dists: Seq[Column] = cents.zipWithIndex.map { case (c, j) =>
      vec_dist_sq(col("embedding"), typedLit(c)).as(s"d$j")
    }
    val withD = emb.select(col("vec_id") +: col("embedding") +: dists: _*)
    // argmin in LINEAR expression size (r13): the old strict-< fold
    // nested the running-min expression twice per step — 2^k tree
    // nodes, which at the trained-quantizer's k=16 turned one Lloyd
    // pass into ~30 s of analysis/codegen. least() + a first-equal
    // when-chain is linear and picks the SAME lowest cluster on ties
    // (dmin IS one of the dj bit-for-bit — no arithmetic between),
    // matching the oracle's row_number() ORDER BY d, cl.
    val dmin = least((0 until cents.size).map(j => col(s"d$j")): _*)
    val cluster = (1 until cents.size).foldLeft(
      when(col("d0") === col("dmin"), lit(0L))) { case (acc, j) =>
      acc.when(col(s"d$j") === col("dmin"), lit(j.toLong))
    }
    withD.withColumn("dmin", dmin)
      .select(col("vec_id"), col("embedding"),
        cluster.as("cluster"), col("dmin").as("dist_sq"))
  }

  /** Lloyd iterations over any (vec_id, embedding) relation; returns
    * the final assignment. Driver actions per iteration: ONE collect of
    * k×dim per-dim means (the model update — same pattern as the BPE
    * argmax and the LSH hyperplanes).
    */
  /** Deterministic init: the k lowest vec_ids. orderBy+limit plans as
    * TakeOrderedAndProject — per-partition bounded top-k heaps merged
    * on the driver, NEVER a global sort of the corpus (ClusteringSpec
    * pins the plan so a refactor can't regress it). Exposed so the pin
    * tests the exact frame kmeans collects. */
  private[graft] def initFrame(emb: DataFrame, k: Int): DataFrame =
    emb.orderBy("vec_id").limit(k).select("embedding")

  def kmeans(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val cents = lloydCentroids(emb, k, iters)
    assign(emb, cents)
      .select(col("vec_id"), col("cluster"), round(col("dist_sq"), 4).as("dist_sq"))
  }

  /** r13 — the Lloyd loop alone, returning the FINAL centroids: the
    * trained coarse quantizer for the E4/E13 IVF layouts (train once,
    * pin the artifact, assign forever). Deterministic end to end —
    * deterministic init (k lowest vec_ids) + 6-decimal-quantized means
    * — so two trainings over one corpus version agree bit-for-bit. */
  private[graft] def lloydCentroids(emb: DataFrame, k: Int = K,
      iters: Int = Iters): Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = initFrame(emb, k).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    require(cents.size == k, s"kmeans: corpus has fewer than $k vectors")
    val dim = cents.head.size
    for (_ <- 0 until iters) {
      val means = assign(emb, cents)
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getLong(0))
      cents = (0 until k).map { j =>
        // an empty cluster keeps its previous centroid (can't happen
        // with this corpus/init at our sf — ClusteringSpec asserts —
        // but the rule is well-defined and cheap)
        byCluster.get(j.toLong) match {
          case Some(rows) =>
            val m = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
            (0 until dim).map(m).toSeq
          case None => cents(j)
        }
      }
    }
    cents
  }

  def qKmeans(s: SparkSession, d: String): DataFrame =
    kmeans(Tables.embeddings(s, d).select("vec_id", "embedding"))

  /** Unrolled Lloyd's in DuckDB: cN = centroids entering iteration N
    * (c0 = the k lowest vec_ids), aN = assignment under cN via a
    * (vec × k)-row window argmin, each next cN = 6-decimal-quantized
    * per-dim means. dim is 64 in the test corpus (the Spark side
    * probes it; qEmbedDupSql sets the same precedent).
    */
  private val kmeansCtes: String = {
    val dim = 64
    val distExpr =
      s"list_sum(list_transform(range(1, ${dim + 1}), " +
        "i -> (e.embedding[i]::DOUBLE - c.c[i]) * (e.embedding[i]::DOUBLE - c.c[i])))"
    def assignCte(n: Int): String =
      s"""a$n AS (SELECT vec_id, embedding, cl, d FROM (
         |  SELECT vec_id, embedding, cl, d,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
         |  FROM (SELECT e.vec_id, e.embedding, c.cl, $distExpr AS d
         |        FROM e CROSS JOIN c$n c))
         |  WHERE rn = 1)""".stripMargin
    def updateCte(n: Int): String =
      s"""c${n + 1} AS (SELECT cl, list(m ORDER BY dim) AS c FROM (
         |  SELECT cl, i AS dim, round(avg(embedding[i]::DOUBLE), 6) AS m
         |  FROM a$n, unnest(range(1, ${dim + 1})) AS r(i) GROUP BY cl, i)
         |  GROUP BY cl)""".stripMargin
    val iterCtes = (0 until Iters)
      .map(n => assignCte(n) + ",\n" + updateCte(n)).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cl,
       |  list_transform(embedding, x -> x::DOUBLE) AS c
       |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT $K)),
       |$iterCtes,
       |${assignCte(Iters)}""".stripMargin
  }

  val qKmeansSql: String =
    kmeansCtes + s"\nSELECT vec_id, cl AS cluster, round(d, 4) AS dist_sq FROM a$Iters"

  val CoresetM = 25

  /** E8 — coreset / diversity selection: the m vectors CLOSEST to
    * their cluster centroid, per cluster — the cluster-stratified
    * subset a data-selection pipeline trains or evals on instead of
    * the full corpus. Selection runs through the NATIVE bounded
    * top-k-per-key operator (B18) with score = −dist², so per-cluster
    * state is m rows on every partial buffer — no full sort of the
    * corpus, no window shuffle of anything but survivors. Ties break
    * on the ROUNDED distance then vec_id, identically in the oracle.
    */
  def coreset(emb: DataFrame, m: Int = CoresetM): DataFrame = {
    val assigned = kmeans(emb)
      .withColumn("neg_d", -col("dist_sq"))
    graft.plans.NativeTopK
      .topKPerKey(assigned, Seq("cluster"), "neg_d", "vec_id", m)
      .select(col("cluster"), col("rank"), col("vec_id"),
        round(-col("neg_d"), 4).as("dist_sq"))
  }

  def qCoreset(s: SparkSession, d: String): DataFrame =
    coreset(Tables.embeddings(s, d).select("vec_id", "embedding"))

  val qCoresetSql: String =
    kmeansCtes +
      s"""
         |SELECT cluster, rank, vec_id, dist_sq FROM (
         |  SELECT vec_id, cl AS cluster, round(d, 4) AS dist_sq,
         |    CAST(row_number() OVER (PARTITION BY cl
         |      ORDER BY round(d, 4), vec_id) AS BIGINT) AS rank
         |  FROM a$Iters)
         |WHERE rank <= $CoresetM""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmeans" -> qKmeans,
    "q_coreset" -> qCoreset)

  def oracles: Map[String, String] = Map(
    "q_kmeans" -> qKmeansSql,
    "q_coreset" -> qCoresetSql)
}
