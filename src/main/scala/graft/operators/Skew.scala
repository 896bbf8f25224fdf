package graft.operators

import org.apache.spark.sql.DataFrame
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
  * the unsalted join.
  */
object Skew {

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
}
