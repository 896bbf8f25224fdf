package graft

import graft.functions.NativeExprs
import org.apache.spark.sql.functions._

/** Edge-case behavior of the native expressions. */
class NativeExprSpec extends SparkTestBase {

  test("word_shingles: degenerate inputs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b"),            // < 3 tokens → empty
      (2L, "  x   y  z  "),   // irregular whitespace → one shingle
      (3L, "w w w w"),        // repeated tokens → distinct shingles only
      (4L, ""),               // empty string → empty
    ).toDF("id", "text")
      .select(col("id"), NativeExprs.word_shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(df(1L) == Nil)
    assert(df(2L) == List("x y z"))
    assert(df(3L) == List("w w w")) // two identical shingles collapse to one
    assert(df(4L) == Nil)
  }

  test("cosine_sim: orthogonal, opposite, zero-vector (NaN) semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),  // orthogonal → 0
      (2L, Array(1.0f, 0.0f), Array(-1.0f, 0.0f)), // opposite → -1
      (3L, Array(0.0f, 0.0f), Array(1.0f, 0.0f)),  // zero vec → NaN (0/0)
    ).toDF("id", "a", "b")
      .select(col("id"), NativeExprs.cosine_sim(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df(1L) == 0.0)
    assert(df(2L) == -1.0)
    assert(df(3L).isNaN, "zero-norm input yields NaN; callers threshold-filter it out")
  }

  test("minhash_band_keys: stable across runs, sensitive to content") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                 (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("id", "text")
      .select(col("id"),
        NativeExprs.minhash_band_keys(NativeExprs.word_shingles(col("text"))).as("bk"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val m2 = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(m == m2, "deterministic")
    assert(m(1L) != m(2L), "one word changed → some band keys must differ")
    assert(m(1L).zip(m(2L)).exists { case (a, b) => a == b } ||
           m(1L) != m(2L)) // near-dup texts typically still share bands
  }
}
