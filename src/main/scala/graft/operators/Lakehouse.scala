package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance and governed-release operations on the landed lake —
  * what runs ON the parquet the reference's ingest loop writes
  * (`ETLTask.java:213-219` lays files out per (topic, time-bucket,
  * partition); a real lake then compacts them, applies deletes without
  * rewriting, and releases privacy-protected aggregates):
  *
  *  - q271: small-file COMPACTION planning (the OPTIMIZE bin-pack) from
  *    file-grain statistics only — the corpus is never read.
  *  - q272: POSITION-DELETE (deletion-vector) application — merge-on-read
  *    semantics as a co-keyed anti-join, no data-file rewrite.
  *  - q273: DIFFERENTIALLY-PRIVATE release of per-source counts via the
  *    two-sided geometric mechanism with a literal inverse-CDF table.
  *  - q274: l-DIVERSITY audit over the q250 quasi-identifier grouping —
  *    the sensitive-attribute diversity check k-anonymity alone misses.
  */
object Lakehouse extends QueryPack {

  /** Compaction target size (arbitrary byte units shared with the
    * oracle); a plan literal so the spec can pin it. */
  private[graft] val compactTarget = 131072L

  /** q271: COMPACTION PLAN — the nightly OPTIMIZE decision computed
    * from FILE-GRAIN statistics alone: simulate the ingest layout
    * (partition = ship month, ~40 writer files per partition, a
    * deterministic per-row byte estimate), then within each partition
    * assign files to output bins by the one-pass shelf rule — files
    * ordered (size desc, id), bin = floor(cumsum_before / target) —
    * and report per partition the before/after file counts, small-file
    * counts and fill. Everything after the one file-grain aggregate is
    * window arithmetic over ~40 rows per partition; at 100 TB the
    * file inventory IS this relation (a metastore listing), and the
    * planner never touches a data row. Bins can exceed target only
    * when a single file does (files are never split) — the shelf
    * rule's documented property. */
  private def q271CompactionPlan(s: SparkSession, d: String): DataFrame = {
    val files = Tables.lineitem(s, d)
      .select(
        expr("year(l_shipdate) * 100 + month(l_shipdate)").cast("long").as("p"),
        expr("l_orderkey % 40").as("file_id"),
        expr("96 + l_partkey % 64").as("bytes"))
      .groupBy("p", "file_id")
      .agg(sum("bytes").as("fbytes"), count(lit(1)).as("frows"))
    val w = Window.partitionBy("p").orderBy(col("fbytes").desc, col("file_id"))
    val planned = files
      .withColumn("csb",
        coalesce(sum("fbytes").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                 lit(0L)))
      .withColumn("bin", expr(s"csb div ${compactTarget}L"))
    val perBin = planned.groupBy("p", "bin").agg(sum("fbytes").as("bbytes"))
      .groupBy("p").agg(count(lit(1)).as("n_bins"), max("bbytes").as("max_bin"))
    planned.groupBy("p")
      .agg(count(lit(1)).as("n_files"),
           sum(expr(s"CASE WHEN fbytes < ${compactTarget / 2}L THEN 1 ELSE 0 END"))
             .as("n_small"),
           sum("fbytes").as("tot_bytes"))
      .join(perBin, "p")
      .select(col("p"), col("n_files"), col("n_small"), col("tot_bytes"),
        col("n_bins"), col("max_bin"),
        expr(s"""floor(cast(tot_bytes as double) * 1000
                       / (n_bins * ${compactTarget}L)) / 1000""").as("avg_fill"))
      .orderBy("p")
  }

  /** q272: DELETION-VECTOR APPLY — merge-on-read position deletes: the
    * corpus sits in immutable files (here file = doc_id div 50, pos =
    * doc_id % 50 — the ingest order), a takedown predicate materializes
    * as a (file_id, pos) delete-vector relation, and the read applies
    * it with ONE co-keyed anti-join — no data file is rewritten, which
    * at 100 TB is the difference between a metadata-sized write and a
    * corpus rewrite. Report: per-file row/deleted/live counts plus an
    * exact integer survivor checksum certifying WHICH rows survived,
    * not just how many. */
  private def q272DeleteVectors(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), expr("doc_id div 50").as("file_id"),
              expr("doc_id % 50").as("pos"), col("text"))
    val dv = docs.filter(expr("substr(md5(text), 1, 1) IN ('0', '1')"))
      .select(col("file_id").as("dfile"), col("pos").as("dpos"))
    val live = docs.join(dv,
        col("file_id") === col("dfile") && col("pos") === col("dpos"),
        "left_anti")
    val delCnt = docs.join(dv,
        col("file_id") === col("dfile") && col("pos") === col("dpos"),
        "left_semi")
      .groupBy("file_id").agg(count(lit(1)).as("n_deleted"))
    docs.groupBy("file_id").agg(count(lit(1)).as("n_rows"))
      .join(delCnt, Seq("file_id"), "left")
      .join(live.groupBy("file_id")
              .agg(count(lit(1)).as("n_live"), sum("doc_id").as("live_sum")),
            Seq("file_id"), "left")
      .select(col("file_id"), col("n_rows"),
              coalesce(col("n_deleted"), lit(0L)).as("n_deleted"),
              coalesce(col("n_live"), lit(0L)).as("n_live"),
              coalesce(col("live_sum"), lit(0L)).as("live_sum"))
      .orderBy("file_id")
  }

  /** ε and the inverse-CDF literal table for q273's two-sided geometric
    * mechanism (α = e^-ε): P(K = k) = (1-α)/(1+α)·α^|k|, k truncated at
    * |k| ≤ 40 (residual mass < 1e-8 — the documented δ of the truncated
    * mechanism). Thresholds quantize the CDF onto the 2^20 hash-uniform
    * domain; generated ONCE here and embedded as the same literal rows
    * in both plans, so determinism is by construction. */
  private[graft] val dpEpsilonTimes10 = 5 // ε = 0.5
  private[graft] val dpNoiseTable: Seq[(Long, Long, Long)] = {
    val alpha = math.exp(-dpEpsilonTimes10 / 10.0)
    val bound = 40
    val m = 1L << 20
    val ks = (-bound to bound)
    val pmf = ks.map(k => (1 - alpha) / (1 + alpha) * math.pow(alpha, math.abs(k)))
    val cdf = pmf.scanLeft(0.0)(_ + _).tail
    val hi = cdf.map(c => math.min(m, math.round(c * m)))
    val lo = 0L +: hi.init
    ks.zip(lo.zip(hi)).collect {
      case (k, (l, h)) if h > l => (k.toLong, l, h)
    }
  }

  /** q273: DP COUNT RELEASE — per-source document counts released under
    * the two-sided geometric mechanism (the discrete Laplace used by
    * production DP deployments; sensitivity 1 for add/remove-one-doc).
    * Noise is drawn DETERMINISTICALLY for the gate: each source's
    * 20-bit md5 uniform indexes the literal inverse-CDF table
    * ([[dpNoiseTable]], broadcast range join); production swaps the
    * hash-uniform for a fresh secret draw, same plan. The released
    * count clamps at 0. `noise` is emitted as the certification rider
    * (a real release ships source + n_released only — documented, the
    * q195 discipline). One S-row aggregate + one broadcast join. */
  private def q273DpRelease(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val noise = dpNoiseTable.toDF("k", "lo", "hi")
    Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("u",
        expr("cast(conv(substr(md5(concat('dp-', source)), 1, 5), 16, 10) as bigint)"))
      .join(broadcast(noise), col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("source"), col("n_docs"), col("k").as("noise"),
              greatest(lit(0L), expr("n_docs + k")).as("n_released"))
      .orderBy("source")
  }

  /** q274: l-DIVERSITY AUDIT — the sensitive-attribute check layered on
    * q250's quasi-identifier grouping (event_type, hour-of-day, value
    * magnitude bin): a group can be k-anonymous yet expose its members
    * when every row shares one sensitive value, so the release gate
    * also requires ≥ l DISTINCT sensitive values per group (sensitive
    * here: the user cohort user_id % 10). Two aggregates — QI-grain
    * distinct-count, then per-event_type rollup of violations (l < 3)
    * and the rows they expose. Both shuffles are QI-grain, never
    * row-grain wide. */
  private def q274LDiversity(s: SparkSession, d: String): DataFrame = {
    val qi = Tables.events(s, d)
      .select(col("event_type"),
              expr("unix_micros(ts) div 3600000000 % 24").as("hod"),
              expr("""length(bin(greatest(cast(floor(value * 100 + 0.5)
                      as bigint), 1)))""").cast("long").as("vbin"),
              expr("user_id % 10").as("sens"))
    val g = qi.groupBy("event_type", "hod", "vbin")
      .agg(count(lit(1)).as("n"), countDistinct("sens").as("l"))
    g.groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
           sum("n").as("n_rows"),
           min("l").as("min_l"),
           sum(expr("CASE WHEN l < 3 THEN 1 ELSE 0 END")).as("n_violations"),
           sum(expr("CASE WHEN l < 3 THEN n ELSE 0 END")).as("n_exposed_rows"))
      .withColumn("exposed_share",
        expr("floor(cast(n_exposed_rows as double) * 1000 / n_rows) / 1000"))
      .select("event_type", "n_groups", "n_rows", "min_l", "n_violations",
              "n_exposed_rows", "exposed_share")
      .orderBy("event_type")
  }

  /** q276: t-CLOSENESS AUDIT — the third rung of the anonymity ladder
    * (k-anonymity q250 → l-diversity q274 → this): a group can hold ≥ l
    * distinct sensitive values and still leak when its sensitive
    * DISTRIBUTION deviates from the corpus-wide one (the classic
    * salary-skew example), so the release gate also bounds the
    * per-group total-variation distance to the global distribution:
    * TV(p_g, p) = ½ Σ_v |p_g(v) − p(v)| ≤ t (t = 1/4 here; for ordinal
    * attributes the standard uses EMD — TV is the categorical form).
    * Exact integers end-to-end: TV's numerator cross-multiplies to
    * Σ_v |c_gv·N − g_v·n_g| over the (group × sensitive-domain) grid —
    * the grid is QI-groups × |domain| (both bounded however big the
    * corpus), absent values contribute g_v·n_g via the left join, and
    * the t-test cross-multiplies too (TV > 1/4 ⟺ 2·Σ > n_g·N), so the
    * only doubles are the floored closing reports. The cross-products
    * need N·c ≤ 2^63 — fine to ~3e9 rows; past that production runs the
    * identical plan on DECIMAL(38) or per-stratum shards. */
  private def q276TCloseness(s: SparkSession, d: String): DataFrame = {
    val qi = Tables.events(s, d)
      .select(col("event_type"),
              expr("unix_micros(ts) div 3600000000 % 24").as("hod"),
              expr("""length(bin(greatest(cast(floor(value * 100 + 0.5)
                      as bigint), 1)))""").cast("long").as("vbin"),
              expr("user_id % 10").as("sens"))
    val cell = qi.groupBy("event_type", "hod", "vbin", "sens")
      .agg(count(lit(1)).as("c"))
    val glob = qi.groupBy("sens").agg(count(lit(1)).as("g"))
    val tot = qi.agg(count(lit(1)).as("nn"))
    val grp = cell.groupBy("event_type", "hod", "vbin").agg(sum("c").as("n"))
    val grid = grp
      .crossJoin(broadcast(glob)).crossJoin(broadcast(tot))
      .join(cell, Seq("event_type", "hod", "vbin", "sens"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
    val tv = grid.groupBy("event_type", "hod", "vbin")
      .agg(max("n").as("n"), max("nn").as("nn"),
           sum(expr("abs(c0 * nn - g * n)")).as("tvnum"))
    tv.groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"), sum("n").as("n_rows"),
           max(expr(
             "floor(cast(tvnum as double) * 1000 / (2 * n * nn)) / 1000"))
             .as("max_t"),
           sum(expr("CASE WHEN 2 * tvnum > n * nn THEN 1L ELSE 0L END"))
             .as("n_violations"),
           sum(expr("CASE WHEN 2 * tvnum > n * nn THEN n ELSE 0L END"))
             .as("n_exposed_rows"))
      .withColumn("exposed_share",
        expr("floor(cast(n_exposed_rows as double) * 1000 / n_rows) / 1000"))
      .select("event_type", "n_groups", "n_rows", "max_t", "n_violations",
              "n_exposed_rows", "exposed_share")
      .orderBy("event_type")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q271_compaction_plan" -> q271CompactionPlan _,
    "q272_delete_vectors" -> q272DeleteVectors _,
    "q273_dp_release" -> q273DpRelease _,
    "q274_l_diversity" -> q274LDiversity _,
    "q276_t_closeness" -> q276TCloseness _,
  )

  private val dpNoiseValuesSql: String =
    dpNoiseTable.map { case (k, l, h) => s"($k, $l, $h)" }.mkString(", ")

  override val oracles: Map[String, String] = Map(
    "q271_compaction_plan" ->
      s"""WITH files AS (SELECT year(l_shipdate) * 100 + month(l_shipdate) AS p,
                                l_orderkey % 40 AS file_id,
                                CAST(sum(96 + l_partkey % 64) AS BIGINT)
                                  AS fbytes,
                                count(*) AS frows
                         FROM lineitem GROUP BY 1, 2),
         planned AS (SELECT p, file_id, fbytes,
                            coalesce(sum(fbytes) OVER (
                              PARTITION BY p
                              ORDER BY fbytes DESC, file_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS csb
                     FROM files),
         binned AS (SELECT p, file_id, fbytes,
                           csb // ${compactTarget} AS bin
                    FROM planned),
         per_bin AS (SELECT p, bin, CAST(sum(fbytes) AS BIGINT) AS bbytes
                     FROM binned GROUP BY 1, 2),
         bins AS (SELECT p, count(*) AS n_bins, max(bbytes) AS max_bin
                  FROM per_bin GROUP BY 1),
         pf AS (SELECT p, count(*) AS n_files,
                       CAST(sum(CASE WHEN fbytes < ${compactTarget / 2}
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
                       CAST(sum(fbytes) AS BIGINT) AS tot_bytes
                FROM binned GROUP BY 1)
         SELECT pf.p, pf.n_files, pf.n_small, pf.tot_bytes,
                bins.n_bins, bins.max_bin,
                floor(CAST(pf.tot_bytes AS DOUBLE) * 1000
                      / (bins.n_bins * ${compactTarget})) / 1000 AS avg_fill
         FROM pf JOIN bins USING (p) ORDER BY pf.p""",
    "q272_delete_vectors" ->
      """WITH docs AS (SELECT doc_id, doc_id // 50 AS file_id,
                              doc_id % 50 AS pos, text
                       FROM documents),
         dv AS (SELECT file_id, pos FROM docs
                WHERE substr(md5(text), 1, 1) IN ('0', '1')),
         live AS (SELECT d.* FROM docs d
                  WHERE NOT EXISTS (SELECT 1 FROM dv
                                    WHERE dv.file_id = d.file_id
                                      AND dv.pos = d.pos))
         SELECT d.file_id, count(*) AS n_rows,
                CAST(count(*) FILTER (WHERE dv.pos IS NOT NULL) AS BIGINT)
                  AS n_deleted,
                CAST(count(*) FILTER (WHERE dv.pos IS NULL) AS BIGINT)
                  AS n_live,
                CAST(coalesce(sum(d.doc_id) FILTER (WHERE dv.pos IS NULL), 0)
                  AS BIGINT) AS live_sum
         FROM docs d
         LEFT JOIN dv ON dv.file_id = d.file_id AND dv.pos = d.pos
         GROUP BY d.file_id ORDER BY d.file_id""",
    "q273_dp_release" ->
      s"""WITH noise(k, lo, hi) AS (VALUES $dpNoiseValuesSql),
         cnt AS (SELECT source, count(*) AS n_docs,
                        CAST(('0x' || substr(md5('dp-' || source), 1, 5))
                          AS BIGINT) AS u
                 FROM documents GROUP BY 1)
         SELECT cnt.source, cnt.n_docs, CAST(noise.k AS BIGINT) AS noise,
                CAST(greatest(0, cnt.n_docs + noise.k) AS BIGINT) AS n_released
         FROM cnt JOIN noise ON cnt.u >= noise.lo AND cnt.u < noise.hi
         ORDER BY cnt.source""",
    // q276: the same QI/sens CTE as q274; TV numerator cross-multiplied
    // onto the (group × sensitive-domain) grid, absent cells via the
    // left join; the t-test and every sum are exact integers
    "q276_t_closeness" ->
      """WITH qi AS (SELECT event_type,
                            epoch_us(ts::TIMESTAMP) // 3600000000 % 24 AS hod,
                            CAST(len(bin(greatest(CAST(floor("value" * 100 + 0.5)
                              AS BIGINT), 1))) AS BIGINT) AS vbin,
                            user_id % 10 AS sens
                     FROM events),
         cell AS (SELECT event_type, hod, vbin, sens, count(*) AS c
                  FROM qi GROUP BY 1, 2, 3, 4),
         gl AS (SELECT sens, count(*) AS g FROM qi GROUP BY 1),
         tot AS (SELECT count(*) AS nn FROM qi),
         grp AS (SELECT event_type, hod, vbin, CAST(sum(c) AS BIGINT) AS n
                 FROM cell GROUP BY 1, 2, 3),
         grid AS (SELECT grp.event_type, grp.hod, grp.vbin, grp.n,
                         gl.sens, gl.g, tot.nn,
                         coalesce(cell.c, 0) AS c0
                  FROM grp CROSS JOIN gl CROSS JOIN tot
                  LEFT JOIN cell ON cell.event_type = grp.event_type
                                AND cell.hod = grp.hod
                                AND cell.vbin = grp.vbin
                                AND cell.sens = gl.sens),
         tv AS (SELECT event_type, hod, vbin, max(n) AS n, max(nn) AS nn,
                       CAST(sum(abs(c0 * nn - g * n)) AS BIGINT) AS tvnum
                FROM grid GROUP BY 1, 2, 3)
         SELECT event_type, count(*) AS n_groups,
                CAST(sum(n) AS BIGINT) AS n_rows,
                max(floor(CAST(tvnum AS DOUBLE) * 1000 / (2 * n * nn))
                    / 1000) AS max_t,
                CAST(sum(CASE WHEN 2 * tvnum > n * nn THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations,
                CAST(sum(CASE WHEN 2 * tvnum > n * nn THEN n ELSE 0 END)
                  AS BIGINT) AS n_exposed_rows,
                floor(CAST(sum(CASE WHEN 2 * tvnum > n * nn THEN n ELSE 0 END)
                      AS DOUBLE) * 1000 / sum(n)) / 1000 AS exposed_share
         FROM tv GROUP BY 1 ORDER BY event_type""",
    "q274_l_diversity" ->
      """WITH qi AS (SELECT event_type,
                            epoch_us(ts::TIMESTAMP) // 3600000000 % 24 AS hod,
                            CAST(len(bin(greatest(CAST(floor("value" * 100 + 0.5)
                              AS BIGINT), 1))) AS BIGINT) AS vbin,
                            user_id % 10 AS sens
                     FROM events),
         g AS (SELECT event_type, hod, vbin, count(*) AS n,
                      count(DISTINCT sens) AS l
               FROM qi GROUP BY 1, 2, 3)
         SELECT event_type, count(*) AS n_groups,
                CAST(sum(n) AS BIGINT) AS n_rows,
                CAST(min(l) AS BIGINT) AS min_l,
                CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_violations,
                CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
                  AS n_exposed_rows,
                floor(CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS DOUBLE)
                      * 1000 / sum(n)) / 1000 AS exposed_share
         FROM g GROUP BY 1 ORDER BY event_type""",
  )
}
