package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BEHAVIORAL MINING over the ingested event stream — the pattern /
  * co-occurrence / recency tier of the product-analytics family
  * (q176/q190/q193/q199). The reference engine lands events into
  * partitioned parquet and stops (`KafkaETLParquetConsumer.java` —
  * SURVEY.md §2 "Explicit absences: no query surface"); these are the
  * standard follow-on reads every event warehouse runs on that landing
  * zone. All three are single-shuffle user-or-type-keyed shapes with
  * integer-exact arithmetic in any partition order (the repo's
  * oracle-parity discipline: integers until one single-rounded division
  * per output value).
  */
object Behavior extends QueryPack {

  /** Association-rule support floor — pairs below this many co-occurring
    * users carry no statistical signal and would make `lift` noisy. */
  private val minPairUsers = 3

  /** q212: EVENT-TYPE ASSOCIATION RULES — market-basket mining at the
    * user grain: for every unordered event-type pair, how many users
    * did BOTH, with support (share of all users), directional
    * confidence P(b|a), and lift n_ab·N/(n_a·n_b) — the independence
    * ratio that separates "co-occurs because both are common" from a
    * real behavioral association (the same ratio-not-log choice as
    * q180: a ratio of integer-derived doubles is bit-exact
    * cross-engine where log-PMI is not). Shape: one distinct
    * (user, type) projection — the only corpus-sized shuffle — then a
    * user-keyed self-join whose per-user fan-out is bounded by the
    * TYPE VOCABULARY (T² pairs per user, T = |event types| ≪ N, here
    * 5), type totals as a T-row broadcast, the user total as a lazy
    * one-row broadcast aggregate. At 100 TB the distinct() is the
    * partial-aggregatable dedup Spark already map-side-combines; the
    * pair relation it feeds is T²·U rows of ids, never payloads. */
  private def q212AssocRules(s: SparkSession, d: String): DataFrame = {
    val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t_a"), col("b.event_type").as("t_b"))
      .agg(count(lit(1)).as("n_ab"))
    val tc = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val tot = ut.agg(countDistinct("user_id").as("nu"))
    pairs
      .join(broadcast(tc.select(col("event_type").as("t_a"),
                                col("n").as("n_a"))), Seq("t_a"))
      .join(broadcast(tc.select(col("event_type").as("t_b"),
                                col("n").as("n_b"))), Seq("t_b"))
      .crossJoin(broadcast(tot))
      .filter(col("n_ab") >= minPairUsers)
      .select(col("t_a"), col("t_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("floor(cast(n_ab as double) / nu * 1000000) / 1000000")
          .as("support"),
        expr("floor(cast(n_ab as double) / n_a * 1000000) / 1000000")
          .as("conf_ab"),
        expr("""floor(cast(n_ab as double) * nu
                      / (cast(n_a as double) * n_b) * 1000) / 1000""")
          .as("lift"))
      .orderBy("t_a", "t_b")
  }

  /** q213: TOP EVENT-TYPE PATHS — the most common length-3 behavioral
    * sequences across user timelines (the "view > click > purchase"
    * journey report; the SEQUENTIAL complement of q190's one-step
    * transition matrix and the free-form sibling of q176's fixed
    * funnel). Each user's timeline is ordered by the deterministic
    * (ts, event_id) chain (the q144 tie-break discipline) and trigrams
    * fall out of two `lead` window calls — NO collect_list, so the
    * whale-user caveat the q190 comment documents does not arise: state
    * per row is two strings regardless of timeline length. One
    * user_id-keyed shuffle (the partitioning the events landing zone is
    * already bucketed by), integer counts, global top-20 as
    * TakeOrderedAndProject (per-partition bounded heaps, no full sort). */
  private def q213EventPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type").as("t1"))
      .withColumn("t2", lead("t1", 1).over(w))
      .withColumn("t3", lead("t1", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** Decay clamp: ages beyond this many days contribute weight 0 (their
    * exact weight 2^-(age) is below 1e-6 of the newest day's and cannot
    * change any floored output digit). Keeping the clamp small also
    * keeps every scaled weight an exact BIGINT: 2^(clampDays) max. */
  private[operators] val clampDays = 20

  /** q214: TIME-DECAYED EVENT COUNTS — exponentially-decayed "trending"
    * mass per event type (half-life one day), the recency-weighted
    * complement of q199's RFM recency bucket and the standard freshness
    * signal behind trending dashboards and decayed document frequency.
    * Parity hardening: the decayed sum is partition-order-FREE because
    * each event's weight is the exact integer 2^(clampDays − age_days)
    * (a `shiftleft`, no `pow`, no float sum — the q208 HLL trick of
    * integerizing a power-of-two series so Σ is an exact BIGINT in any
    * order); the reported decayed mass divides by 2^clampDays (an exact
    * mantissa shift in double) and the share divides two exact integers
    * once, floored. The reference date is the corpus max day as a lazy
    * one-row broadcast aggregate (q74's threshold pattern), so the
    * whole thing is one scan + one T-row aggregate; at 100 TB the
    * weight projection is map-side and the aggregate partial-folds. */
  private def q214DecayedCounts(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), to_date(col("ts")).as("dt"))
    val maxd = ev.agg(max("dt").as("maxd"))
    val weighted = ev.crossJoin(broadcast(maxd))
      .select(col("event_type"),
        expr(s"""CASE WHEN datediff(maxd, dt) <= $clampDays
                 THEN shiftleft(cast(1 as bigint),
                                $clampDays - datediff(maxd, dt))
                 ELSE cast(0 as bigint) END""").as("w"))
    val perType = weighted.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("w").as("decayed_scaled"))
    val tot = weighted.agg(sum("w").as("tw"))
    perType.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_events"), col("decayed_scaled"),
        expr(s"""floor(cast(decayed_scaled as double)
                       / ${1L << clampDays} * 1000000) / 1000000""")
          .as("decayed"),
        expr("""floor(cast(decayed_scaled as double)
                      / cast(tw as double) * 1000000) / 1000000""")
          .as("share"))
      .orderBy("event_type")
  }

  /** q226: USER GROWTH CURVE — daily active users, first-seen new
    * users, and the cumulative user count: the acquisition dashboard
    * every event warehouse serves, and the DENOMINATOR feed q193's
    * retention matrix normalizes by. Two corpus passes collapse to the
    * day grain immediately: a distinct (day, user) projection for
    * actives and a per-user min(day) first-seen aggregate for news —
    * both partial-folding, both shuffling (date, id) pairs only. The
    * cumulative sum is an unpartitioned window ON THE DAY-GRAIN
    * RELATION — D rows for a D-day corpus regardless of event volume,
    * so the single-partition window is bounded by the calendar, not
    * the data (the q215 value-domain argument). Dates emit as
    * formatted strings (the strftime parity rule); counts are exact
    * integers. */
  private def q226UserGrowth(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("dt"), col("user_id"))
    val daily = ev.distinct().groupBy("dt")
      .agg(count(lit(1)).as("active_users"))
    val newu = ev.groupBy("user_id").agg(min("dt").as("dt"))
      .groupBy("dt").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("dt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(newu, Seq("dt"), "left")
      .select(col("dt"), col("active_users"),
              coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(w))
      .select(date_format(col("dt"), "yyyy-MM-dd").as("dt"),
              col("active_users"), col("new_users"), col("cum_users"))
      .orderBy("dt")
  }

  /** Trailing window, in days, for q230 (a 7-day WAU). */
  private[operators] val rollWindowDays = 7

  /** q230: ROLLING ACTIVE USERS — daily actives beside the trailing
    * 7-day distinct-actives (DAU/WAU), the stickiness pair every
    * engagement dashboard reads against q226's growth curve. Sliding
    * distinct counts are the classically awkward aggregate (a user
    * active twice in the window must count once, so per-day counts
    * cannot sum); the scale-correct relational form used here: the
    * corpus collapses to distinct (day, user) pairs ONCE, each pair
    * explodes to the ≤ W trailing report days it covers, and one
    * (day, user) distinct + day-grain count closes it — work is
    * |active pairs|·W with day-grain output, no per-day re-scan of
    * the corpus, and every shuffle carries (date, id) pairs. Report
    * days are restricted to the corpus calendar (the cover-day
    * explode would otherwise invent post-corpus days). Exact
    * integers throughout; dates emit as formatted strings. */
  private def q230RollingActive(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(to_date(col("ts")).as("dt"), col("user_id")).distinct()
    val daily = du.groupBy("dt").agg(count(lit(1)).as("dau"))
    val cover = du
      .select(explode(expr(
        s"sequence(dt, date_add(dt, ${rollWindowDays - 1}))")).as("rd"),
        col("user_id"))
      .distinct()
      .groupBy(col("rd").as("dt")).agg(count(lit(1)).as("wau"))
    daily.join(cover, Seq("dt"))
      .select(date_format(col("dt"), "yyyy-MM-dd").as("dt"), col("dau"),
              col("wau"))
      .orderBy("dt")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_rolling_active" -> q230RollingActive _,
    "q226_user_growth"    -> q226UserGrowth _,
    "q212_assoc_rules"    -> q212AssocRules _,
    "q213_event_paths"    -> q213EventPaths _,
    "q214_decayed_counts" -> q214DecayedCounts _,
  )

  override val oracles: Map[String, String] = Map(
    // q230: same (day, user) collapse + covering-day explode; the
    // inner join restricts report days to the corpus calendar
    "q230_rolling_active" ->
      """WITH du AS (SELECT DISTINCT ts::DATE AS dt, user_id FROM events),
         daily AS (SELECT dt, count(*) AS dau FROM du GROUP BY 1),
         cover AS (SELECT DISTINCT dt + CAST(k AS INTEGER) AS rd, user_id
                   FROM du, (SELECT unnest(range(0, 7)) AS k) u),
         wau AS (SELECT rd AS dt, count(*) AS wau FROM cover GROUP BY 1)
         SELECT strftime(daily.dt, '%Y-%m-%d') AS dt, dau, wau
         FROM daily JOIN wau ON wau.dt = daily.dt
         ORDER BY dt""",
    // q226: same day-grain collapse; the cumulative window runs on the
    // calendar-sized relation; dates compared as formatted strings
    "q226_user_growth" ->
      """WITH ev AS (SELECT ts::DATE AS dt, user_id FROM events),
         daily AS (SELECT dt, count(*) AS active_users
                   FROM (SELECT DISTINCT dt, user_id FROM ev) GROUP BY 1),
         fs AS (SELECT user_id, min(dt) AS dt FROM ev GROUP BY 1),
         newu AS (SELECT dt, count(*) AS new_users FROM fs GROUP BY 1),
         j AS (SELECT daily.dt, active_users,
                      coalesce(new_users, 0) AS new_users
               FROM daily LEFT JOIN newu ON newu.dt = daily.dt)
         SELECT strftime(dt, '%Y-%m-%d') AS dt, active_users,
                CAST(new_users AS BIGINT) AS new_users,
                CAST(sum(new_users) OVER (ORDER BY dt
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM j ORDER BY dt""",
    // q212: integer counts; support/confidence one floored division each,
    // lift the fixed-parenthesization integer-derived ratio (no log)
    "q212_assoc_rules" ->
      s"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          pr AS (SELECT a.event_type AS t_a, b.event_type AS t_b,
                        count(*) AS n_ab
                 FROM ut a JOIN ut b
                   ON a.user_id = b.user_id AND a.event_type < b.event_type
                 GROUP BY 1, 2),
          tc AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
          tot AS (SELECT count(DISTINCT user_id) AS nu FROM ut)
          SELECT t_a, t_b, n_ab, ta.n AS n_a, tb.n AS n_b,
                 floor(CAST(n_ab AS DOUBLE) / nu * 1000000) / 1000000
                   AS support,
                 floor(CAST(n_ab AS DOUBLE) / ta.n * 1000000) / 1000000
                   AS conf_ab,
                 floor(CAST(n_ab AS DOUBLE) * nu
                       / (CAST(ta.n AS DOUBLE) * tb.n) * 1000) / 1000 AS lift
          FROM pr JOIN tc ta ON ta.event_type = t_a
                  JOIN tc tb ON tb.event_type = t_b, tot
          WHERE n_ab >= $minPairUsers
          ORDER BY t_a, t_b""",
    // q213: identical deterministic (ts, event_id) ordering; lead()
    // semantics agree; top-20 by (n DESC, path) total order
    "q213_event_paths" ->
      """WITH seq AS (
           SELECT user_id, event_type AS t1,
                  lead(event_type, 1) OVER w AS t2,
                  lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT t1, t2, t3, count(*) AS n
         FROM seq WHERE t3 IS NOT NULL
         GROUP BY t1, t2, t3
         ORDER BY n DESC, t1, t2, t3 LIMIT 20""",
    // q214: exact power-of-two integer weights (<<), BIGINT sums in any
    // order, one exact 2^-20 mantissa-shift division + one floored share
    "q214_decayed_counts" ->
      s"""WITH ev AS (SELECT event_type, ts::DATE AS dt FROM events),
          mx AS (SELECT max(dt) AS maxd FROM ev),
          wt AS (SELECT event_type,
                        CASE WHEN date_diff('day', dt, maxd) <= $clampDays
                             THEN 1::BIGINT <<
                                  ($clampDays - date_diff('day', dt, maxd))
                             ELSE 0::BIGINT END AS w
                 FROM ev, mx),
          pt AS (SELECT event_type, count(*) AS n_events,
                        CAST(sum(w) AS BIGINT) AS decayed_scaled
                 FROM wt GROUP BY 1),
          tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wt)
          SELECT event_type, n_events, decayed_scaled,
                 floor(CAST(decayed_scaled AS DOUBLE)
                       / ${1L << clampDays} * 1000000) / 1000000 AS decayed,
                 floor(CAST(decayed_scaled AS DOUBLE)
                       / CAST(tw AS DOUBLE) * 1000000) / 1000000 AS share
          FROM pt, tot ORDER BY event_type""",
  )
}
