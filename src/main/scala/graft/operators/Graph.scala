package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup candidate graph (D9) — PageRank
  * as fixed-iteration distributed join+aggregate, the GraphX/Pregel
  * workload re-expressed in DataFrames (the same shape as the D8
  * connected-components loop).
  *
  * Scale design: the graph (near-dup pairs) is tiny relative to the
  * corpus; each iteration is ONE edge⋈rank hash join plus ONE
  * dst-keyed aggregate — both shuffles on the node key, so at 100 TB
  * of edges this is the standard iterative-join layout with
  * `localCheckpoint` bounding lineage per round. The weighted edge
  * list (1/outdegree) is computed once and cached; N ships as a
  * literal. Per-iteration ranks are quantized to 8 decimals so the
  * DuckDB oracle (unrolled CTEs, same quantization) tracks the Spark
  * values bit-for-bit regardless of either engine's summation order.
  */
object Graph {

  val Damping = 0.85
  val PrIters = 3

  def pagerank(pairs: DataFrame, iters: Int = PrIters,
      damping: Double = Damping): DataFrame = {
    // one materialization of the pair list; see triangles() — the
    // union/degree/weight derivations below would otherwise re-run
    // the upstream near-dup pipeline several times each
    val e1 = pairs.toDF("src", "dst").localCheckpoint()
    // near-dup similarity is symmetric → undirected graph, no dangling
    // nodes (every node has outdegree >= 1), total rank mass conserved
    val edges = e1.union(e1.select(col("dst"), col("src"))).toDF("src", "dst")
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count() // N as literal (model-as-literal pattern)
    if (n == 0)
      return nodes.select(col("node").as("doc_id"), lit(0.0).as("pr"))
    val wedges = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint()
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contribs = wedges
        .join(ranks, wedges("src") === ranks("node"))
        .groupBy("dst").agg(sum(col("w") * col("pr")).as("contrib"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("contrib"), lit(0.0)), 8).as("pr"))
        .localCheckpoint()
    }
    ranks.select(col("node").as("doc_id"), col("pr"))
  }

  def qPagerank(s: SparkSession, d: String): DataFrame =
    pagerank(Dedup.nearDupPairs(s, d).select("doc_a", "doc_b"))

  /** Unrolled PageRank in DuckDB over the identical jaccard-pair graph:
    * rN = ranks entering iteration N, quantized round(·, 8) exactly as
    * the Spark loop. Every fractional literal is cast ::DOUBLE — DuckDB
    * parses bare decimal literals as DECIMAL, whose exact arithmetic
    * would diverge from Spark's binary doubles at the last ulp.
    */
  val qPagerankSql: String = {
    def iterCte(t: Int): String =
      s"""r${t + 1} AS (
         |  SELECT nodes.node,
         |    round((1 - 0.85::DOUBLE) / nn.n + 0.85::DOUBLE * coalesce(c.contrib, 0), 8) AS pr
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT we.dst, sum(we.w * r$t.pr) AS contrib
         |    FROM we JOIN r$t ON we.src = r$t.node GROUP BY we.dst) c
         |  ON c.dst = nodes.node)""".stripMargin
    Dedup.shinglesCte + Dedup.jaccardPairsCte +
      s""",
         |dup AS (SELECT doc_a, doc_b
         |  FROM p JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
         |  WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup
         |  UNION ALL SELECT doc_b, doc_a FROM dup),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |we AS (SELECT e.src, e.dst, 1::DOUBLE / deg.deg AS w
         |  FROM e JOIN deg ON e.src = deg.src),
         |r0 AS (SELECT node, 1::DOUBLE / nn.n AS pr FROM nodes CROSS JOIN nn),
         |${(0 until PrIters).map(iterCte).mkString(",\n")}
         |SELECT node AS doc_id, pr FROM r$PrIters""".stripMargin
  }

  /** D10 — per-node triangle counts over the near-dup graph.
    *
    * Scale design: the naive formulation joins the symmetric edge list
    * three ways, so a hub of degree d contributes d² wedges. Instead
    * every edge is DIRECTED from its lower- to its higher-(degree, id)
    * endpoint first ("degree ordering"): each triangle then has exactly
    * one rank-ordered orientation (counted once, no /6 correction), and
    * wedge fan-out is bounded by max OUT-degree, which degree ordering
    * caps at O(sqrt(m)) — the standard bound that makes distributed
    * triangle counting survive power-law graphs. Both joins shuffle on
    * a node key; no cartesian anywhere.
    */
  def triangles(pairs: DataFrame): DataFrame = {
    // materialize the edge list ONCE: everything below (symmetrize,
    // degrees, orientation, zero-fill) re-reads it, and re-deriving
    // the near-dup pair pipeline per reference would dominate the
    // whole computation (the graph is tiny relative to the corpus)
    val e1 = pairs.toDF("a", "b").localCheckpoint()
    val sym = e1.union(e1.select(col("b"), col("a"))).toDF("u", "v").distinct()
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), col("deg"))
    val o = sym
      .join(deg.as("du"), sym("u") === col("du.node"))
      .join(deg.as("dv"), sym("v") === col("dv.node"))
      .filter(col("du.deg") < col("dv.deg") ||
        (col("du.deg") === col("dv.deg") && sym("u") < sym("v")))
      .select(sym("u"), sym("v"))
      .localCheckpoint() // read 3× below; graph ≪ corpus
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.v") === col("e2.u"))
      .join(o.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("cnt"))
    deg.select("node")
      .join(perNode, Seq("node"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("cnt"), lit(0L)).cast("long").as("tri_cnt"))
  }

  def qTriangles(s: SparkSession, d: String): DataFrame =
    triangles(Dedup.nearDupPairs(s, d).select("doc_a", "doc_b"))

  /** Identical degree-ordering in SQL: same (deg, id) rank, same single
    * orientation per triangle, zero-filled over the node set. */
  val qTrianglesSql: String =
    Dedup.shinglesCte + Dedup.jaccardPairsCte +
      """,
        |dup AS (SELECT doc_a, doc_b
        |  FROM p JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
        |  WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup
        |  UNION ALL SELECT doc_b, doc_a FROM dup),
        |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
        |o AS (SELECT e.src AS u, e.dst AS v FROM e
        |  JOIN deg du ON e.src = du.node JOIN deg dv ON e.dst = dv.node
        |  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.src < e.dst)),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM o e1
        |  JOIN o e2 ON e1.v = e2.u
        |  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tn AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t),
        |pn AS (SELECT node, count(*) AS cnt FROM tn GROUP BY node)
        |SELECT deg.node AS doc_id,
        |  CAST(coalesce(pn.cnt, 0) AS BIGINT) AS tri_cnt
        |FROM deg LEFT JOIN pn ON pn.node = deg.node""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank,
    "q_triangles" -> ((s, d) => qTriangles(s, d)))

  def oracles: Map[String, String] = Map(
    "q_pagerank" -> qPagerankSql,
    "q_triangles" -> qTrianglesSql)
}
