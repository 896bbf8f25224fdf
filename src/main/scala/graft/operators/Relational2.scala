package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational pack (round 2): range join, correlated scalar
  * subqueries, deterministic hash sampling, exact integral correlation,
  * gap detection, and array aggregation — operator families the round-1
  * pack didn't exercise.
  *
  * Scale notes (100 TB design points):
  *  - q63's band side is a 10-row literal relation — broadcast nested-loop
  *    is the right physical plan (per-row band lookup, no shuffle of part);
  *    a monotone band function could also be computed as floor(price/width),
  *    but the query exercises the general inequality-join path;
  *  - q64's correlated scalars decorrelate into one broadcastable per-brand
  *    aggregate joined back — never per-row subquery execution;
  *  - q67's sampling is a pure per-row hash filter (no sort, no shuffle
  *    before the tiny per-lang agg) — the streaming-friendly way to sample;
  *  - q69 computes correlation from exact integer power sums (quantity is
  *    integral, price scaled to cents): partial aggregation is exact in
  *    decimal/int128, so the result is bit-identical regardless of
  *    partitioning — no float-summation-order nondeterminism;
  *  - q70/q71 window/aggregate within o_custkey partitions — parallel by
  *    customer at any scale.
  */
object Relational2 extends QueryPack {

  /** Range (band) join: parts priced into 10-wide bands via an
    * inequality-only join against a literal band relation. */
  private def q63RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(0, 10).select(
      col("id").as("band"),
      (lit(900.0) + col("id") * 10.0).as("lo"),
      (lit(900.0) + (col("id") + 1) * 10.0).as("hi"))
    Tables.part(s, d)
      .join(broadcast(bands),
            col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"),
           round(avg("p_retailprice"), 2).as("avg_price"))
      .orderBy("band")
  }

  /** Correlated scalar subqueries: parts priced >2% above their brand's
    * average. The comparison is pure integer arithmetic on exact sums
    * (cents x count x 50 > sum_cents x 51), so membership is deterministic
    * across engines — no float-average boundary flips. */
  private def q64AboveBrandAvg(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(
      """SELECT p_partkey, p_brand, p_retailprice
         FROM part p
         WHERE CAST(round(p_retailprice * 100) AS bigint)
               * (SELECT count(*) FROM part p2 WHERE p2.p_brand = p.p_brand) * 50
             > (SELECT sum(CAST(round(p3.p_retailprice * 100) AS bigint))
                FROM part p3 WHERE p3.p_brand = p.p_brand) * 51
         ORDER BY p_partkey""")
  }

  /** Deterministic stratified sampling: keep a doc iff the first 4 hex
    * chars of md5(salt || doc_id) fall under the stratum's threshold
    * (en 50%, other langs 20%). Reproducible across engines and runs;
    * no shuffle until the tiny per-lang count. */
  private def q67HashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h", substring(md5(concat(lit("salt1:"), col("doc_id").cast("string"))), 1, 4))
      .filter((col("lang") === "en" && col("h") < "8000") ||
              (col("lang") =!= "en" && col("h") < "3333"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
           min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang")

  /** Pearson correlation of quantity vs price per return flag, computed
    * from exact integer power sums (quantity integral; price in cents;
    * squares summed as 38-digit decimals). The only floating-point steps
    * are the final casts and one fixed expression tree — deterministic
    * under any partitioning, unlike corr()'s running-moment formula. */
  private def q69CorrExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
              expr("CAST(l_quantity AS decimal(19,0))").as("x"),
              expr("CAST(round(l_extendedprice * 100) AS decimal(19,0))").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("decimal(20,0)").as("n"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("x") * col("y")).as("sxy"),
           sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        (floor(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
             * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          * 1000000) / 1000000).as("corr_qty_price"))
      .orderBy("l_returnflag")

  /** Equal-width histogram of order totals: pass 1 computes global
    * min/max (one tiny agg), pass 2 broadcasts them and bins map-side —
    * the shuffle carries only 20 bin counters per task. The binning
    * expression is the identical IEEE tree in both engines, so bin
    * membership is deterministic. */
  private def q68Histogram(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_totalprice"))
    val mm = o.agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
    o.crossJoin(broadcast(mm))
      .select(
        least(lit(19), floor((col("o_totalprice") - col("mn"))
                             / ((col("mx") - col("mn")) / 20))).cast("long").as("bin"),
        col("o_totalprice"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"),
           round(avg("o_totalprice"), 2).as("avg_price"))
      .orderBy("bin")
  }

  /** Gap detection: per-customer order sequences with >180-day silences
    * (lag window partitioned by customer — parallel at any scale). */
  private def q70OrderGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("prev_date", lag("o_orderdate", 1).over(w))
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .filter(col("gap_days") > 180)
      .select(col("o_custkey"), col("o_orderkey"),
              date_format(col("prev_date"), "yyyy-MM-dd").as("prev_order"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("curr_order"),
              col("gap_days"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Array aggregation: each customer's distinct order years as a sorted
    * comma-joined string (string form keeps the oracle hash comparable). */
  private def q71ArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .groupBy("o_custkey")
      .agg(expr("concat_ws(',', transform(array_sort(collect_set(yr)), x -> CAST(x AS string)))")
             .as("order_years"),
           countDistinct("yr").as("n_years"))
      .orderBy("o_custkey")

  /** Top-k per group via the bounded-heap aggregate (`TopKAgg`) — same
    * exact semantics as the window form (score desc, id asc tie-break;
    * the oracle IS the window SQL) expressed as a two-phase aggregate:
    * partial heaps bound each map task at k rows per group and the final
    * phase is a heap-merge with no Sort/Window pass over survivors. See
    * TopKAgg's scaladoc for the honest comparison with Spark's own
    * WindowGroupLimit optimization. Plan shape asserted in CurationSpec.
    */
  private def q77TopkAgg(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy("p_brand")
      .agg(graft.functions.TopKAgg
        .top_k_by_score(col("p_retailprice"), col("p_partkey"), 3).as("top"))
      .select(col("p_brand"), posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("p_brand"), (col("rnk0") + 1).cast("long").as("rnk"),
              col("t.id").as("p_partkey"), col("t.score").as("p_retailprice"))
      .orderBy("p_brand", "rnk")

  /** Time-series GAP FILL — the inverse of q70's gap detection: a dense
    * daily spine over the observed date range (one-row min/max aggregate
    * → `sequence`/`explode`, so the spine derives from the data, not a
    * hand-written calendar) left-joined against per-day order counts,
    * zero-filling silent days. Scale: the count aggregate is map-side
    * partial over any corpus size; the spine is O(days) — thousands of
    * rows regardless of data volume — so both join sides post-aggregate
    * are tiny and AQE broadcasts them; nothing big ever shuffles twice. */
  private def q83GapFill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day0"))
      .groupBy("day0").agg(count(lit(1)).as("n"))
    val spine = daily.agg(min("day0").as("mn"), max("day0").as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day0"))
    spine.join(daily, Seq("day0"), "left")
      .select(date_format(col("day0"), "yyyy-MM-dd").as("day"),
              coalesce(col("n"), lit(0L)).as("n_orders"),
              when(col("n").isNull, 1L).otherwise(0L).as("is_gap"))
      .orderBy("day")
  }

  /** Percentile-rank normalization — the distribution-free feature
    * scaling an ML pipeline applies per stratum: percent_rank and
    * cume_dist of document length within each language. The (n_chars,
    * doc_id) tiebreak makes every rank unique, so both outputs are exact
    * integer ratios (bit-identical cross-engine, no float-order
    * ambiguity). One shuffle keyed by lang; window work parallel per
    * stratum at any scale (a lang-skewed corpus shards the partition key,
    * same note as q46's packing). */
  private def q87RankNorm(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy("doc_id")
  }

  /** DATA-QUALITY CONSTRAINT AUDIT — the Deequ-style validation suite a
    * landing zone runs after the reference's ingest writes parquet: one
    * row per declared constraint with its violation metric and verdict.
    * Checks: non-emptiness, key-column null counts, primary-key
    * uniqueness (orders, customer), referential integrity (orders →
    * customer, lineitem → orders — counted as orphan rows via anti-
    * joins), and a domain-range rule (TPC-H quantities in [1, 50]).
    * All metrics are exact integer counts — cross-engine parity is
    * trivial and the gate certifies the CHECKS themselves, not just
    * their plumbing. Scale shape: each check is one aggregate or one
    * key-shuffled anti-join (the dim side broadcastable); the suite is
    * a union of one-row aggregates, so the whole audit is a single lazy
    * plan a scheduler can run as one job. */
  private def q189DataQuality(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val customer = Tables.customer(s, d)
    val lineitem = Tables.lineitem(s, d)
    def row(id: Int, tbl: String, check: String, metric: Column,
            pass: Column): DataFrame => DataFrame = df =>
      df.agg(metric.cast("long").as("metric"))
        .select(lit(id.toLong).as("check_id"), lit(tbl).as("tbl"),
                lit(check).as("check"), col("metric"),
                pass.as("pass"))
    val checks = Seq(
      row(1, "orders", "non_empty", count(lit(1)),
          col("metric") > 0)(orders),
      row(2, "orders", "o_custkey_nulls",
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)),
          col("metric") === 0)(orders),
      row(3, "orders", "o_orderkey_unique",
          count(lit(1)) - countDistinct(col("o_orderkey")),
          col("metric") === 0)(orders),
      row(4, "customer", "c_custkey_unique",
          count(lit(1)) - countDistinct(col("c_custkey")),
          col("metric") === 0)(customer),
      row(5, "orders", "fk_customer", count(lit(1)),
          col("metric") === 0)(
        orders.join(customer,
                    orders("o_custkey") === customer("c_custkey"),
                    "left_anti")),
      row(6, "lineitem", "fk_orders", count(lit(1)),
          col("metric") === 0)(
        lineitem.join(orders,
                      lineitem("l_orderkey") === orders("o_orderkey"),
                      "left_anti")),
      row(7, "lineitem", "quantity_range",
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)),
          col("metric") === 0)(lineitem))
    checks.reduce(_.unionByName(_)).orderBy("check_id")
  }

  /** q256: FUNCTIONAL-DEPENDENCY AUDIT — schema profiling beside
    * q189's declared-constraint suite: instead of checking rules
    * someone wrote down, DISCOVER whether lhs → rhs holds by comparing
    * |distinct lhs| with |distinct (lhs, rhs)| — equal means every lhs
    * value maps to one rhs value (the FD a normalizer, a join
    * eliminator, or a CDC key-inference pass wants); the difference is
    * the exact violation count (near-FDs with a handful of violations
    * usually mean dirty rows, not a false dependency). Each candidate
    * is two distinct-count aggregates unioned into one lazy plan (the
    * q189 union-of-one-row-aggregates shape); DISTINCT keeps NULL rows
    * in both engines so the counts agree by construction. */
  private def q256FdAudit(s: SparkSession, d: String): DataFrame = {
    def cand(tbl: String, t: DataFrame, lhs: String, rhs: String): DataFrame =
      t.select(lhs).distinct().agg(count(lit(1)).as("n_lhs"))
        .crossJoin(
          t.select(lhs, rhs).distinct().agg(count(lit(1)).as("n_pairs")))
        .select(lit(tbl).as("tbl"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
                col("n_lhs"), col("n_pairs"))
    val rows = Seq(
      cand("nation", Tables.nation(s, d), "n_nationkey", "n_name"),
      cand("nation", Tables.nation(s, d), "n_regionkey", "n_name"),
      cand("orders", Tables.orders(s, d), "o_orderkey", "o_custkey"),
      cand("orders", Tables.orders(s, d), "o_custkey", "o_orderstatus"),
      cand("lineitem", Tables.lineitem(s, d), "l_orderkey", "l_suppkey"),
      cand("lineitem", Tables.lineitem(s, d), "l_partkey", "l_suppkey"))
    rows.reduce(_.unionByName(_))
      .withColumn("violations", col("n_pairs") - col("n_lhs"))
      .withColumn("fd_holds",
        expr("CAST(CASE WHEN n_pairs = n_lhs THEN 1 ELSE 0 END AS BIGINT)"))
      .select("tbl", "lhs", "rhs", "n_lhs", "n_pairs", "violations",
              "fd_holds")
      .orderBy("tbl", "lhs", "rhs")
  }

  /** q275: SKYLINE (Pareto frontier) — parts no other part dominates on
    * (size, price) with both maximized: the classic preference operator
    * missing from SQL engines' builtin set. The plan works at the
    * DISTINCT-(size, price) GRAIN, not the row grain: dedupe first (a
    * bounded |sizes|×|prices| relation however big the table is), then
    * ONE ordered sweep — under (size desc, price desc) order a pair is
    * dominated iff the running max of price over STRICTLY-preceding
    * rows reaches it (preceding rows have larger size, or equal size
    * and larger price — either way domination; ties are equal pairs and
    * never dominate, handled by the dedup). Price is integerized to
    * cents once so the ordering and the cummax compare exact integers.
    * Survivors join back broadcast for the per-point part count. The
    * global window sorts only the deduped grain — the 100 TB shape
    * (local per-partition skylines would pre-shrink further; the grain
    * dedup already bounds the sort input). */
  private def q275Skyline(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.part(s, d)
      .select(col("p_size").cast("long").as("psize"),
              expr("cast(round(p_retailprice * 100) as bigint)").as("pc"))
    val grain = pts.groupBy("psize", "pc").agg(count(lit(1)).as("n_parts"))
    val w = Window.orderBy(col("psize").desc, col("pc").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    grain
      .withColumn("mx", max("pc").over(w))
      .filter(col("mx").isNull || col("mx") < col("pc"))
      .select(col("psize"), col("pc"),
              expr("pc / cast(100 as double)").as("price"),
              col("n_parts"))
      .orderBy(col("psize").desc)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q275_skyline" -> q275Skyline _,
    "q256_fd_audit" -> q256FdAudit _,
    "q189_data_quality" -> q189DataQuality _,
    "q63_range_join"   -> q63RangeJoin _,
    "q83_gap_fill"     -> q83GapFill _,
    "q87_rank_norm"    -> q87RankNorm _,
    "q64_corr_subquery" -> q64AboveBrandAvg _,
    "q67_hash_sample"  -> q67HashSample _,
    "q68_histogram"    -> q68Histogram _,
    "q69_corr_exact"   -> q69CorrExact _,
    "q70_order_gaps"   -> q70OrderGaps _,
    "q71_array_agg"    -> q71ArrayAgg _,
    "q77_topk_agg"     -> q77TopkAgg _,
  )

  override val oracles: Map[String, String] = Map(
    // q275: the same dedup-then-sweep — cummax over strictly-preceding
    // rows in (size desc, cents desc) order; survivors where the
    // running max never reached them
    "q275_skyline" ->
      """WITH pts AS (SELECT CAST(p_size AS BIGINT) AS psize,
                             CAST(round(p_retailprice * 100) AS BIGINT) AS pc
                      FROM part),
         grain AS (SELECT psize, pc, count(*) AS n_parts
                   FROM pts GROUP BY 1, 2),
         sw AS (SELECT psize, pc, n_parts,
                       max(pc) OVER (ORDER BY psize DESC, pc DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS mx
                FROM grain)
         SELECT psize, pc, pc / CAST(100 AS DOUBLE) AS price, n_parts
         FROM sw WHERE mx IS NULL OR mx < pc
         ORDER BY psize DESC""",
    // q256: each candidate is two DISTINCT-subquery counts; DISTINCT
    // keeps NULL rows in both engines
    "q256_fd_audit" ->
      """WITH c AS (
           SELECT 'nation' AS tbl, 'n_nationkey' AS lhs, 'n_name' AS rhs,
             (SELECT count(*) FROM (SELECT DISTINCT n_nationkey FROM nation))
               AS n_lhs,
             (SELECT count(*) FROM (SELECT DISTINCT n_nationkey, n_name
                                    FROM nation)) AS n_pairs
           UNION ALL
           SELECT 'nation', 'n_regionkey', 'n_name',
             (SELECT count(*) FROM (SELECT DISTINCT n_regionkey FROM nation)),
             (SELECT count(*) FROM (SELECT DISTINCT n_regionkey, n_name
                                    FROM nation))
           UNION ALL
           SELECT 'orders', 'o_orderkey', 'o_custkey',
             (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders)),
             (SELECT count(*) FROM (SELECT DISTINCT o_orderkey, o_custkey
                                    FROM orders))
           UNION ALL
           SELECT 'orders', 'o_custkey', 'o_orderstatus',
             (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders)),
             (SELECT count(*) FROM (SELECT DISTINCT o_custkey, o_orderstatus
                                    FROM orders))
           UNION ALL
           SELECT 'lineitem', 'l_orderkey', 'l_suppkey',
             (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
             (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_suppkey
                                    FROM lineitem))
           UNION ALL
           SELECT 'lineitem', 'l_partkey', 'l_suppkey',
             (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem)),
             (SELECT count(*) FROM (SELECT DISTINCT l_partkey, l_suppkey
                                    FROM lineitem)))
         SELECT tbl, lhs, rhs, n_lhs, n_pairs,
                n_pairs - n_lhs AS violations,
                CAST(CASE WHEN n_pairs = n_lhs THEN 1 ELSE 0 END AS BIGINT)
                  AS fd_holds
         FROM c ORDER BY tbl, lhs, rhs""",
    // q189: every metric is an exact integer count; pass is the same
    // integer comparison both sides
    "q189_data_quality" ->
      """SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS check_id, 'orders' AS tbl,
                  'non_empty' AS "check",
                  CAST((SELECT count(*) FROM orders) AS BIGINT) AS metric,
                  (SELECT count(*) FROM orders) > 0 AS pass
           UNION ALL
           SELECT 2, 'orders', 'o_custkey_nulls',
                  (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
                  (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0
           UNION ALL
           SELECT 3, 'orders', 'o_orderkey_unique',
                  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
                  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0
           UNION ALL
           SELECT 4, 'customer', 'c_custkey_unique',
                  (SELECT count(*) - count(DISTINCT c_custkey) FROM customer),
                  (SELECT count(*) - count(DISTINCT c_custkey) FROM customer) = 0
           UNION ALL
           SELECT 5, 'orders', 'fk_customer',
                  (SELECT count(*) FROM orders o WHERE NOT EXISTS
                     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
                  (SELECT count(*) FROM orders o WHERE NOT EXISTS
                     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0
           UNION ALL
           SELECT 6, 'lineitem', 'fk_orders',
                  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
                  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
           UNION ALL
           SELECT 7, 'lineitem', 'quantity_range',
                  (SELECT count(*) FROM lineitem
                   WHERE l_quantity < 1 OR l_quantity > 50),
                  (SELECT count(*) FROM lineitem
                   WHERE l_quantity < 1 OR l_quantity > 50) = 0)
         ORDER BY check_id""",
    // q77's oracle is the WINDOW formulation — the heap aggregate must
    // reproduce it exactly (total order: score desc, id asc).
    "q77_topk_agg" ->
      """WITH r AS (SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey) AS rnk
           FROM part)
         SELECT p_brand, rnk, p_partkey, p_retailprice
         FROM r WHERE rnk <= 3 ORDER BY p_brand, rnk""",
    "q63_range_join" ->
      """SELECT b.band, count(*) AS n_parts,
                round(avg(p_retailprice), 2) AS avg_price
         FROM part p
         JOIN (SELECT range AS band, 900.0 + range * 10.0 AS lo,
                      900.0 + (range + 1) * 10.0 AS hi FROM range(0, 10)) b
           ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
         GROUP BY b.band ORDER BY b.band""",
    "q64_corr_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice
         FROM part p
         WHERE CAST(round(p_retailprice * 100) AS BIGINT)
               * (SELECT count(*) FROM part p2 WHERE p2.p_brand = p.p_brand) * 50
             > (SELECT sum(CAST(round(p3.p_retailprice * 100) AS BIGINT))
                FROM part p3 WHERE p3.p_brand = p.p_brand) * 51
         ORDER BY p_partkey""",
    "q67_hash_sample" ->
      """SELECT lang, count(*) AS n_sampled,
                min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM (SELECT lang, doc_id,
                 substr(md5('salt1:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h
               FROM documents)
         WHERE (lang = 'en' AND h < '8000') OR (lang <> 'en' AND h < '3333')
         GROUP BY lang ORDER BY lang""",
    "q68_histogram" ->
      """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
                     FROM orders)
         SELECT CAST(least(19, floor((o_totalprice - mn) / ((mx - mn) / 20)))
                  AS BIGINT) AS bin,
                count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
         FROM orders, mm GROUP BY bin ORDER BY bin""",
    "q69_corr_exact" ->
      """WITH t AS (SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
         a AS (SELECT l_returnflag, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
               FROM t GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                 * 1000000) / 1000000 AS corr_qty_price
         FROM a ORDER BY l_returnflag""",
    "q70_order_gaps" ->
      """WITH w AS (SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev_date
           FROM orders)
         SELECT o_custkey, o_orderkey,
                strftime(prev_date, '%Y-%m-%d') AS prev_order,
                strftime(o_orderdate, '%Y-%m-%d') AS curr_order,
                datediff('day', prev_date, o_orderdate) AS gap_days
         FROM w WHERE datediff('day', prev_date, o_orderdate) > 180
         ORDER BY o_custkey, o_orderkey""",
    "q87_rank_norm" ->
      """SELECT doc_id, lang, n_chars,
                percent_rank() OVER (PARTITION BY lang
                  ORDER BY n_chars, doc_id) AS pr,
                cume_dist() OVER (PARTITION BY lang
                  ORDER BY n_chars, doc_id) AS cd
         FROM documents ORDER BY doc_id""",
    "q83_gap_fill" ->
      """WITH d AS (SELECT o_orderdate::DATE AS day, count(*) AS n
                    FROM orders GROUP BY 1),
         r AS (SELECT unnest(generate_series((SELECT min(day) FROM d),
                                             (SELECT max(day) FROM d),
                                             INTERVAL 1 DAY))::DATE AS day)
         SELECT strftime(r.day, '%Y-%m-%d') AS day, coalesce(n, 0) AS n_orders,
                CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
         FROM r LEFT JOIN d USING (day) ORDER BY day""",
    "q71_array_agg" ->
      """SELECT o_custkey,
                array_to_string(list_sort(list(DISTINCT year(o_orderdate))), ',')
                  AS order_years,
                count(DISTINCT year(o_orderdate)) AS n_years
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
  )
}
