package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Distributed-analytics block (SURVEY.md §2.2 B29-B34 / §2.3 C17) —
  * patterns whose naive single-node formulations break at cluster
  * scale, re-expressed in their distributed shapes:
  *
  *  - global row numbering WITHOUT a single-partition window (the
  *    TeraSort layout: range-partition, rank per partition in
  *    parallel, add broadcast per-partition offsets);
  *  - equi-depth quantile binning built on that rank (exact, no
  *    global sort-collect);
  *  - grouping sets (one Expand + one aggregate for arbitrary
  *    grouping combinations — not a UNION of N scans);
  *  - salted exact count-distinct (set-valued aggregation state is
  *    NOT map-side-combinable the way sums are, so a hot group pins
  *    one reducer; salting BY THE DISTINCT KEY splits the set
  *    disjointly and a second tiny aggregate re-sums — exact);
  *  - z-score outlier detection (tiny stats aggregate broadcast back
  *    against the fact table);
  *  - time-range-frame moving average (per-user window, peers
  *    included by RANGE semantics so ordering ties are harmless);
  *  - blocked fuzzy matching (entity-resolution shape: dedup to
  *    distinct values FIRST, block, then edit-distance only within
  *    blocks — never corpus × corpus).
  */
object Analytics {

  /** B29 — global row numbering over a total order, distributed.
    *
    * `orderBy + row_number() OVER ()` plans a SINGLE-partition window
    * — one task ranks the whole table, the anti-pattern at any scale.
    * The distributed layout: range-partition on the sort keys (each
    * partition holds a contiguous key range), rank WITHIN partitions
    * in parallel, then add each partition's global offset (the count
    * of rows in all lower partitions — a #partitions-row broadcast).
    *
    * The range exchange is pinned with localCheckpoint: partition ids
    * must be identical between the offsets job and the ranking job,
    * and the range partitioner re-samples per materialization. The
    * materialization barrier is inherent to the operator (offsets
    * need every partition's count before any rank is final) — it is
    * the same barrier TeraSort pays.
    */
  def globalRank(df: DataFrame, numParts: Int, keys: Column*): DataFrame = {
    val parted = df.repartitionByRange(numParts, keys: _*).localCheckpoint()
      .withColumn("__pid", spark_partition_id())
    // #partitions rows — the only single-partition window, bounded by
    // the partition count, never by the data
    val offsets = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    parted
      .withColumn("__r", row_number().over(
        Window.partitionBy("__pid").orderBy(keys: _*)))
      .join(broadcast(offsets), "__pid")
      .withColumn("global_rank", col("__off") + col("__r"))
      .drop("__pid", "__r", "__off")
  }

  def qGlobalRank(s: SparkSession, d: String): DataFrame =
    globalRank(
      Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
      numParts = 32,
      col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_totalprice", "global_rank")

  val qGlobalRankSql: String =
    """SELECT o_orderkey, o_totalprice,
      |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS global_rank
      |FROM orders""".stripMargin

  /** B31 — exact equi-depth (quantile) binning: bucket b of k holds
    * ranks (b-1)·N/k .. b·N/k under a total order. Everything the
    * output carries is derivable WITHOUT materializing a rank per row:
    * bucket populations are pure integer arithmetic over N, and each
    * bucket's lo/hi is the VALUE at its boundary rank (ties share a
    * value, so tie-breaking keys can't change it) — 2k weighted-rank
    * selections through the B12 collapsed layout
    * ([[Relational.valueAtRanks]]). The old formulation ranked all N
    * rows (4.1× wall at 100× data, inherent to emitting a rank per
    * row); this one scales with distinct values + a bounded selection
    * pass. N ships as a literal (the model-as-literal pattern, like
    * the unigram LM total).
    */
  def qEquidepth(s: SparkSession, d: String, k: Int = 4): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_extendedprice")
    val n = li.count()
    // bucket b covers ranks rmax(b-1)+1 .. rmax(b), rmax(b) = ⌈bN/k⌉
    // (from ((rn-1)·k) div N = b-1 ⟺ (b-1)N ≤ (rn-1)k < bN)
    def rmax(b: Int): Long = (b * n + k - 1) / k
    val ranks = (1 to k).flatMap(b =>
      Seq(s"lo_$b" -> (rmax(b - 1) + 1), s"hi_$b" -> rmax(b)))
    val sel = Relational.valueAtRanks(
      li.withColumn("__g", lit(1)), Seq("__g"), "l_extendedprice", ranks)
      .collect() // 2k rows — bounded by the bucket count, never data
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (1 to k).map { b =>
      (b.toLong, rmax(b) - rmax(b - 1), r4(sel(s"lo_$b")), r4(sel(s"hi_$b")))
    }
    import s.implicits._
    rows.toDF("bucket", "n_rows", "lo", "hi")
  }

  val qEquidepthSql: String =
    """WITH r AS (
      |  SELECT l_extendedprice,
      |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |    count(*) OVER () AS n
      |  FROM lineitem)
      |SELECT CAST((rn - 1) * 4 // n AS BIGINT) + 1 AS bucket,
      |  count(*) AS n_rows,
      |  round(min(l_extendedprice), 4) AS lo,
      |  round(max(l_extendedprice), 4) AS hi
      |FROM r GROUP BY 1""".stripMargin

  /** B30 — grouping sets: per-source totals, per-lang totals, and the
    * grand total in ONE pass (one Expand + one hash aggregate), where
    * a UNION-of-aggregates formulation scans the table once per set.
    * grouping() flags disambiguate "NULL because aggregated away"
    * from a NULL data value, identically in both engines.
    */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupingSets(
        Seq(Seq(col("source")), Seq(col("lang")), Seq()),
        col("source"), col("lang"))
      .agg(
        grouping(col("source")).cast("long").as("g_source"),
        grouping(col("lang")).cast("long").as("g_lang"),
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"))
      .select("source", "lang", "g_source", "g_lang", "n_docs", "sum_chars")

  val qGroupingSetsSql: String =
    """SELECT source, lang,
      |  grouping(source) AS g_source, grouping(lang) AS g_lang,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((source), (lang), ())""".stripMargin

  /** B34 — salted exact count-distinct. count(DISTINCT x) keeps a SET
    * per group — not algebraic, so map-side partial aggregation cannot
    * shrink it and a hot group's whole set converges on one reducer.
    * Salting by hash(x) splits each group's set into `factor` DISJOINT
    * subsets (x determines its salt, so no value is counted twice),
    * distinct-counts them in parallel, and re-sums — exact, with the
    * hot group's state spread over `factor` reducers. The same layout
    * Spark plans internally via Expand for multi-distinct; shipping it
    * explicitly makes the rewrite available to composed pipelines.
    */
  def saltedDistinct(df: DataFrame, group: String, key: String,
      factor: Int = 16): DataFrame =
    df.groupBy(col(group),
        pmod(xxhash64(col(key)), lit(factor)).as("__salt"))
      .agg(count_distinct(col(key)).as("__c"))
      .groupBy(group)
      .agg(sum("__c").as(s"uniq_$key"))

  def qSaltedDistinct(s: SparkSession, d: String): DataFrame =
    saltedDistinct(Tables.lineitem(s, d), "l_returnflag", "l_partkey")
      .withColumnRenamed("uniq_l_partkey", "uniq_parts")

  val qSaltedDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS uniq_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** B32 — z-score outlier detection over events: per-type mean/stddev
    * (a |types|-row aggregate) broadcast back against the fact table.
    * One full scan + one broadcast join; the fact table never
    * shuffles. Comparison on the ROUNDED z so cross-engine float noise
    * in the moment sums cannot flip threshold-straddling rows.
    */
  def qOutliers(s: SparkSession, d: String, z: Double = 2.5): DataFrame = {
    val ev = Tables.events(s, d)
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("__m"), stddev_samp("value").as("__sd"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("zscore", round((col("value") - col("__m")) / col("__sd"), 4))
      .filter(abs(col("zscore")) > z)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"), col("zscore"))
  }

  val qOutliersSql: String =
    """WITH st AS (
      |  SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      |  FROM events GROUP BY event_type)
      |SELECT event_id, e.event_type, round(value, 4) AS value,
      |  round((value - m) / sd, 4) AS zscore
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE abs(round((value - m) / sd, 4)) > 2.5""".stripMargin

  /** C17 — trailing 1-hour moving average per user (time-RANGE window
    * frame, not ROWS): the frame is defined by the timestamp VALUE, so
    * same-second peers are all included and ordering ties cannot
    * change the result. Partitioned by user_id — high cardinality, so
    * window sort parallelism scales with users, never one task per
    * event type.
    */
  def qMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es")
      .rangeBetween(-3599, Window.currentRow)
    Tables.events(s, d)
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("mov_avg_1h", round(avg("value").over(w), 4))
      .select("event_id", "user_id", "es", "mov_avg_1h")
  }

  val qMovingAvgSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value
      |  FROM events)
      |SELECT event_id, user_id, es,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY es
      |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW), 4) AS mov_avg_1h
      |FROM e""".stripMargin

  /** B33 — blocked fuzzy matching (the entity-resolution join): edit
    * distance is O(|a|·|b|) per comparison, so the scale shape is (1)
    * collapse to DISTINCT values — the same encode-once-per-unique-word
    * layout as BPE tokenization, (2) self-join only within a cheap
    * blocking key (here the head noun), (3) exact levenshtein inside
    * blocks. Corpus × corpus never happens; cost is Σ block².
    */
  def fuzzyPairs(names: DataFrame, col0: String, maxDist: Int): DataFrame = {
    val blocked = names.select(col(col0).as("name")).distinct()
      .withColumn("block", element_at(split(col("name"), " "), -1))
    blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  def qFuzzyMatch(s: SparkSession, d: String): DataFrame =
    fuzzyPairs(Tables.part(s, d), "p_name", maxDist = 3)

  val qFuzzyMatchSql: String =
    """WITH n AS (SELECT DISTINCT p_name AS name,
      |    list_extract(string_split(p_name, ' '), -1) AS block
      |  FROM part)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  levenshtein(a.name, b.name) AS edit_dist
      |FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 3""".stripMargin

  /** B35 — the analytic window-function family (ntile / percent_rank /
    * cume_dist / lag / lead) over per-customer order histories: the
    * partition key is HIGH-cardinality (one customer's orders per
    * window), so window-sort parallelism scales with customers. The
    * in-partition order is a total order (date, then key), making
    * every function deterministic; rank ratios round to 6 decimals in
    * both engines.
    */
  def qWindowFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"))
  }

  val qWindowFuncsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** B36 — ordered collect: each customer's order keys as one sorted,
    * comma-joined string. collect_list's accumulation order is
    * partition-nondeterministic, so the sort happens AFTER collection
    * (sort_array) — the only way a collected sequence is reproducible
    * in a distributed engine. State is bounded per group (a customer's
    * own orders), never corpus-sized.
    */
  def qCollect(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("order_keys"))

  val qCollectSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS order_keys
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** A17 — order-independent table fingerprint (the anti-entropy /
    * replication-check primitive): per-row 60-bit content hash XOR'd
    * per group. XOR is commutative+associative, so the checksum is
    * independent of row order, partitioning, AND engine — two copies
    * of a table can be compared across systems by exchanging one row
    * per group instead of the data. Hashes only integer/string
    * columns (double formatting is engine-specific; the md5-of-concat
    * layout is the same h60 kernel the dedup family oracles). XOR's
    * known blind spot — a row duplicated an even number of times —
    * is covered by the accompanying exact count.
    */
  def tableChecksum(df: DataFrame, group: String, cols: Seq[String]): DataFrame =
    df.selectExpr(group +: cols: _*)
      .withColumn("__h", expr(
        s"CAST(conv(substr(md5(concat_ws('|', ${cols.mkString(", ")})), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy(group)
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("checksum"))

  def qChecksum(s: SparkSession, d: String): DataFrame =
    tableChecksum(Tables.lineitem(s, d), "l_returnflag",
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_linestatus"))

  val qChecksumSql: String =
    """WITH h AS (
      |  SELECT l_returnflag,
      |    CAST(('0x' || substr(md5(concat_ws('|', l_orderkey, l_partkey,
      |      l_suppkey, l_linenumber, l_linestatus)), 1, 15)) AS BIGINT) AS hh
      |  FROM lineitem)
      |SELECT l_returnflag, count(*) AS n_rows, bit_xor(hh) AS checksum
      |FROM h GROUP BY l_returnflag""".stripMargin

  /** B37 — nested types: per-order item STRUCT ARRAYS built, sorted,
    * and reduced with higher-order functions (sort_array over structs
    * orders by field position; aggregate() folds the array without
    * re-exploding). The nested column never shuffles twice — one
    * groupBy builds it, everything downstream is per-row array math.
    * For the oracle the array flattens to a canonical string (struct
    * JSON formatting is engine-specific; 'partkey:qty' joined in line
    * order is not).
    */
  def qNested(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(
        struct(col("l_linenumber"), col("l_partkey"), col("qty")))).as("items"))
      .select(col("l_orderkey"),
        size(col("items")).cast("long").as("n_items"),
        expr("aggregate(items, 0L, (a, x) -> a + x.qty)").as("total_qty"),
        expr("""array_join(transform(items,
          |  x -> concat(CAST(x.l_partkey AS STRING), ':', CAST(x.qty AS STRING))), ',')"""
          .stripMargin).as("items_s"))

  val qNestedSql: String =
    """SELECT l_orderkey, count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
      |  string_agg(l_partkey || ':' || CAST(l_quantity AS BIGINT), ','
      |    ORDER BY l_linenumber, l_partkey, CAST(l_quantity AS BIGINT)) AS items_s
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  /** B38 — correlated scalar subquery: orders priced above their own
    * customer's average. Catalyst DECORRELATES the subquery into an
    * aggregate + join — the rewrite that makes correlated SQL viable
    * distributed (naive per-row re-execution would be O(n) scans).
    * Expressed through the SQL surface on purpose: the decorrelation
    * is a parser/optimizer capability, not a DataFrame pattern.
    */
  def qCorrelated(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(qCorrelatedSql)
  }

  val qCorrelatedSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > round(1.5 * (
      |  SELECT avg(o_totalprice) FROM orders i
      |  WHERE i.o_custkey = o.o_custkey), 2)""".stripMargin

  /** B39 — LATERAL join: for each region's nations, re-usable
    * per-row derived relations (the SQL-standard way to express
    * per-row top-n without window functions). Runs through the SQL
    * surface — Spark plans LATERAL as a rewritten join, DuckDB
    * natively; both return each nation with its region name and the
    * count of customers in that nation.
    */
  def qLateral(s: SparkSession, d: String): DataFrame = {
    Tables.region(s, d).createOrReplaceTempView("region")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(qLateralSql)
  }

  val qLateralSql: String =
    """SELECT r.r_name, n.n_name, c.n_customers
      |FROM region r
      |JOIN nation n ON n.n_regionkey = r.r_regionkey,
      |LATERAL (
      |  SELECT count(*) AS n_customers FROM customer
      |  WHERE c_nationkey = n.n_nationkey) c""".stripMargin

  /** B40 — unpivot / melt (the inverse of B19's pivot): wide measure
    * columns stacked to (key, measure, value) rows via the engine's
    * native unpivot (an Expand node — one pass, no self-union of
    * scans). The long form is what metric stores and plotting layers
    * ingest.
    */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "measure", "value")

  val qUnpivotSql: String =
    """WITH w AS (
      |  SELECT l_returnflag,
      |    round(sum(l_quantity), 4) AS sum_qty,
      |    round(sum(l_extendedprice), 4) AS sum_price,
      |    round(avg(l_discount), 4) AS avg_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
      |UNION ALL
      |SELECT l_returnflag, 'sum_price', sum_price FROM w
      |UNION ALL
      |SELECT l_returnflag, 'avg_disc', avg_disc FROM w""".stripMargin

  /** B41 — MAP-typed aggregation: per source, a lang→count map built
    * from the sorted entry array (map insertion order is the sorted
    * order, so downstream map_entries traversal is deterministic).
    * The map column itself stays Spark-side; the oracle compares the
    * canonical flattened entry string plus the key cardinality —
    * the same engine-neutral encoding as the B37 struct arrays.
    */
  def qMapAgg(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(expr("map_from_entries(array_sort(collect_list(struct(lang, cnt))))").as("m"))
      .select(col("source"),
        size(col("m")).cast("long").as("n_langs"),
        expr("""array_join(transform(map_entries(m),
          |  e -> concat(e.key, ':', CAST(e.value AS STRING))), ',')""".stripMargin)
          .as("lang_counts"))

  val qMapAggSql: String =
    """WITH c AS (
      |  SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2)
      |SELECT source, count(*) AS n_langs,
      |  string_agg(lang || ':' || cnt, ',' ORDER BY lang) AS lang_counts
      |FROM c GROUP BY source""".stripMargin

  /** B42 — end-to-end entity resolution: the B33 blocked fuzzy pairs
    * become edges, D8's min-label connected components collapse them,
    * and every name maps to its component's canonical (minimum)
    * variant — singletons map to themselves. The blocked-pairs →
    * components → canonical-id shape is the standard large-scale
    * record-linkage layout; reuses the dedup family's CC kernel on a
    * different graph.
    */
  def qEntityResolution(s: SparkSession, d: String): DataFrame = {
    // CC runs on 60-bit name hashes (the kernel is long-typed — its
    // convergence test sums labels); canonical = lexicographic min
    // NAME within each component, which is hash-free, so a collision
    // would have to merge components to be visible (~2^-60 at this
    // name cardinality)
    val h = "CAST(conv(substr(md5(name), 1, 15), 16, 10) AS BIGINT)"
    val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      .withColumn("id", expr(h))
    val pairs = fuzzyPairs(Tables.part(s, d), "p_name", maxDist = 3)
    val pairIds = pairs
      .join(names.select(col("name").as("name_a"), col("id").as("ida")), "name_a")
      .join(names.select(col("name").as("name_b"), col("id").as("idb")), "name_b")
      .select("ida", "idb")
    val comps = Dedup.connectedComponents(pairIds.toDF("doc_a", "doc_b"))
    val labeled = names
      .join(comps, names("id") === comps("doc_id"), "left")
      .select(col("name"), coalesce(col("component"), col("id")).as("comp"))
    val canon = labeled.groupBy("comp").agg(min("name").as("canonical"))
    labeled.join(canon, "comp").select("name", "canonical")
  }

  val qEntityResolutionSql: String =
    """WITH RECURSIVE n AS (SELECT DISTINCT p_name AS name,
      |    list_extract(string_split(p_name, ' '), -1) AS block
      |  FROM part),
      |pairs AS (
      |  SELECT a.name AS na, b.name AS nb
      |  FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
      |  WHERE levenshtein(a.name, b.name) <= 3),
      |e AS (SELECT na AS src, nb AS dst FROM pairs
      |  UNION ALL SELECT nb, na FROM pairs),
      |reach AS (
      |  SELECT src AS node, dst AS lbl FROM e
      |  UNION
      |  SELECT r.node, e.dst FROM reach r JOIN e ON e.src = r.lbl)
      |SELECT n.name, coalesce(c.canonical, n.name) AS canonical
      |FROM n LEFT JOIN (
      |  SELECT node, least(node, min(lbl)) AS canonical
      |  FROM reach GROUP BY node) c ON n.name = c.node""".stripMargin

  /** B43 — deterministic A/B testing: hash-assigned cohorts (the F6
    * derandomization — assignment is a pure function of user_id, so
    * any engine reproduces the split) and Welch's t statistic per
    * event type from the moment aggregates. One pass: the t-test is
    * algebraic over (n, mean, variance), all partial-aggregatable.
    */
  def qAbtest(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .selectExpr("event_type", "value",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10) AS BIGINT) % 2 AS grp")
      .groupBy("event_type")
      .agg(
        count(when(col("grp") === 0, 1)).as("n_a"),
        count(when(col("grp") === 1, 1)).as("n_b"),
        avg(when(col("grp") === 0, col("value"))).as("__ma"),
        avg(when(col("grp") === 1, col("value"))).as("__mb"),
        var_samp(when(col("grp") === 0, col("value"))).as("__va"),
        var_samp(when(col("grp") === 1, col("value"))).as("__vb"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("__ma") - col("__mb"), 4).as("mean_diff"),
        round((col("__ma") - col("__mb")) /
          sqrt(col("__va") / col("n_a") + col("__vb") / col("n_b")), 4).as("t_stat"))

  val qAbtestSql: String =
    """WITH g AS (
      |  SELECT event_type, value,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS BIGINT) % 2 AS grp
      |  FROM events),
      |m AS (
      |  SELECT event_type,
      |    count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
      |    count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
      |    avg(CASE WHEN grp = 0 THEN value END) AS ma,
      |    avg(CASE WHEN grp = 1 THEN value END) AS mb,
      |    var_samp(CASE WHEN grp = 0 THEN value END) AS va,
      |    var_samp(CASE WHEN grp = 1 THEN value END) AS vb
      |  FROM g GROUP BY event_type)
      |SELECT event_type, n_a, n_b,
      |  round(ma - mb, 4) AS mean_diff,
      |  round((ma - mb) / sqrt(va / n_a + vb / n_b), 4) AS t_stat
      |FROM m""".stripMargin

  /** B44 — data-quality constraint checking (the Deequ/dbt-test
    * shape): a suite of declarative rules evaluated against the
    * warehouse in a handful of scans, emitting one (rule, violations)
    * row each — completeness (nulls), domain (range/set membership),
    * uniqueness (key cardinality), and referential integrity (FK
    * anti-join). Each rule is a full-table aggregate or anti-join —
    * the shapes that stay one pass at any scale; a CI gate asserts
    * `violations == 0` the same way a test suite asserts green.
    */
  def qDqChecks(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val rules = Seq(
      "lineitem.l_orderkey NOT NULL" ->
        li.filter(col("l_orderkey").isNull).count(),
      "lineitem.l_quantity IN [1,50]" ->
        li.filter(col("l_quantity") < 1 || col("l_quantity") > 50).count(),
      "lineitem.l_returnflag IN (A,N,R)" ->
        li.filter(!col("l_returnflag").isin("A", "N", "R")).count(),
      "orders.o_orderkey UNIQUE" -> {
        val n = o.count(); n - o.select("o_orderkey").distinct().count()
      },
      "orders.o_custkey REFERENCES customer" ->
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count(),
      "orders.o_totalprice > 0" ->
        o.filter(col("o_totalprice") <= 0).count())
    import s.implicits._
    rules.toDF("rule", "violations")
  }

  val qDqChecksSql: String =
    """SELECT 'lineitem.l_orderkey NOT NULL' AS rule,
      |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS violations
      |UNION ALL SELECT 'lineitem.l_quantity IN [1,50]',
      |  (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      |UNION ALL SELECT 'lineitem.l_returnflag IN (A,N,R)',
      |  (SELECT count(*) FROM lineitem WHERE l_returnflag NOT IN ('A', 'N', 'R'))
      |UNION ALL SELECT 'orders.o_orderkey UNIQUE',
      |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
      |UNION ALL SELECT 'orders.o_custkey REFERENCES customer',
      |  (SELECT count(*) FROM orders o LEFT JOIN customer c
      |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
      |UNION ALL SELECT 'orders.o_totalprice > 0',
      |  (SELECT count(*) FROM orders WHERE o_totalprice <= 0)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> qDqChecks,
    "q_entity_resolution" -> qEntityResolution,
    "q_abtest" -> qAbtest,
    "q_unpivot" -> qUnpivot,
    "q_map_agg" -> qMapAgg,
    "q_correlated" -> qCorrelated,
    "q_lateral" -> qLateral,
    "q_nested" -> qNested,
    "q_checksum" -> qChecksum,
    "q_window_funcs" -> qWindowFuncs,
    "q_collect" -> qCollect,
    "q_global_rank" -> qGlobalRank,
    "q_equidepth" -> ((s, d) => qEquidepth(s, d)),
    "q_grouping_sets" -> qGroupingSets,
    "q_salted_distinct" -> qSaltedDistinct,
    "q_outliers" -> ((s, d) => qOutliers(s, d)),
    "q_moving_avg" -> qMovingAvg,
    "q_fuzzy_match" -> qFuzzyMatch)

  def oracles: Map[String, String] = Map(
    "q_dq_checks" -> qDqChecksSql,
    "q_entity_resolution" -> qEntityResolutionSql,
    "q_abtest" -> qAbtestSql,
    "q_unpivot" -> qUnpivotSql,
    "q_map_agg" -> qMapAggSql,
    "q_correlated" -> qCorrelatedSql,
    "q_lateral" -> qLateralSql,
    "q_nested" -> qNestedSql,
    "q_checksum" -> qChecksumSql,
    "q_window_funcs" -> qWindowFuncsSql,
    "q_collect" -> qCollectSql,
    "q_global_rank" -> qGlobalRankSql,
    "q_equidepth" -> qEquidepthSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_salted_distinct" -> qSaltedDistinctSql,
    "q_outliers" -> qOutliersSql,
    "q_moving_avg" -> qMovingAvgSql,
    "q_fuzzy_match" -> qFuzzyMatchSql)
}
