package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB problem AQE's skew-join
  * split handles automatically; this is the explicit form for when the
  * skew is known and extreme — e.g. a null-ish sentinel key holding 10%
  * of a fact table).
  *
  * `saltedJoin(facts, dim, key, S)`: the big side's rows are spread over
  * S sub-keys by a deterministic hash of the whole key (so one hot key
  * becomes S tasks); the small side is replicated S× by exploding a salt
  * sequence. Join on (key, salt), then drop the salt. Semantics are
  * exactly inner-join equality on `key` — asserted in ScaleSpec against
  * the unsalted join, and certified cross-engine by q171 whose oracle is
  * the PLAIN join SQL (salting must be value-neutral by construction).
  */
object Skew extends QueryPack {

  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salts: Int): DataFrame = {
    // salt from the key plus a per-row fingerprint so a single hot key
    // actually spreads; deterministic (hash of row content, no rand()).
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Salt fan-out used by q171 — a plan literal so PlanSpec can pin the
    * replication factor in the physical plan. */
  private[graft] val q171Salts = 8

  /** SALTED JOIN under the oracle gate — a DELIBERATELY skewed join
    * (l_linenumber has exactly 7 distinct values over the whole fact
    * table: each key holds ~1/7 of lineitem, the hot-key shape salting
    * exists for) routed through [[saltedJoin]] against the nation dim.
    * The oracle is the PLAIN inner-join SQL: a hash match proves the
    * salting is value-neutral row-for-row — no duplicated, dropped or
    * misrouted rows from the fan-out/replication dance. PlanSpec pins
    * the mechanics (the [[q171Salts]]-way explode on the small side and
    * the __salt equi-join key); ScaleSpec asserts equality against the
    * unsalted DataFrame join. Scale shape: the big side never shuffles
    * more than a plain shuffle join would — the salt only refines its
    * key — while the small side replicates S×, turning each hot key
    * into S independent tasks. */
  private def q171SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val dim = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    saltedJoin(big, dim, "l_linenumber", "n_nationkey", q171Salts)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
              col("n_name"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_salted_join" -> q171SaltedJoin _,
  )

  override val oracles: Map[String, String] = Map(
    // the PLAIN join — value-neutrality of the salt is the contract
    "q171_salted_join" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                n_name, l_quantity
         FROM lineitem JOIN nation ON l_linenumber = n_nationkey
         ORDER BY l_orderkey, l_linenumber""",
  )
}
