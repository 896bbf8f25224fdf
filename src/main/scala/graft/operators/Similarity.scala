package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.{NativeExprs, VectorExprs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2 row 12
  * [extension]): brute-force cosine top-k as the exactness baseline, a
  * random-hyperplane LSH bucketed variant as the scale path, and
  * threshold-based cosine near-dup pairing.
  *
  * Scale notes:
  *  - q40 broadcasts the (small, fixed) query set against the corpus scan —
  *    one pass over N corpus vectors, no shuffle of the big side; per-query
  *    top-k via window. At 100 TB the same plan holds: the only shuffle is
  *    the |Q|×k result.
  *  - q41 replaces the all-pairs O(N²) with signature-bucket equi-joins:
  *    candidates are generated per 8-bit band bucket (expected bucket size
  *    N/256) and verified by exact cosine. At 1000× data, band width /
  *    count are the tuning knobs — the plan shape (explode → shuffle on
  *    band key → in-bucket pairing) is the standard distributed ANN/LSH
  *    pattern.
  *  - q44 does exact all-pairs (correct at test scale, quadratic); its
  *    scale path IS q41 — kept separately so the oracle can verify the
  *    exact result.
  */
object Similarity extends QueryPack {

  // Brute-force cosine top-5 for query vectors vec_id < 10. Cosine is the
  // native CosineSim expression (tight primitive loop, math identical to
  // the declarative double-widened fold — see NativeExprs).
  private def q40CosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", NativeExprs.cosine_sim(col("embedding"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("vec_id").as("n_id"),
              (floor(col("cos") * 100000) / 100000).as("cosine"))
      .orderBy("q_id", "rnk")
  }

  /** corpus with double vectors (for the LSH signature dot products). */
  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), VectorExprs.asDouble("embedding").as("v"))

  /** Deterministic random hyperplanes: `nPlanes` × 64 gaussians, fixed seed. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int = 64, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Add `nBands` signature columns (sig_0 …), each an `bitsPerBand`-bit
    * sign-pattern of dots against fixed hyperplanes (SimHash for cosine).
    * One native-expression pass computes all bands (the interpreted
    * nested-aggregate form allocated a zip_with array per bit per row and
    * dominated this query's bench time). */
  private[graft] def withSignatures(df: DataFrame, nBands: Int, bitsPerBand: Int): DataFrame = {
    val planes = hyperplanes(nBands * bitsPerBand)
    val withArr = df.withColumn("sigs",
      NativeExprs.hyperplane_sigs(col("v"), planes, nBands, bitsPerBand))
    (0 until nBands).foldLeft(withArr) { (acc, b) =>
      acc.withColumn(s"sig_$b", col("sigs").getItem(b))
    }.drop("sigs")
  }

  // LSH-bucketed ANN: 2 bands × 8 bits; candidates share at least one band
  // bucket; verified by exact cosine >= 0.2. Rows-only driver check (ANN
  // quality = recall, asserted against brute force in SimilaritySpec).
  private def q41AnnLsh(s: SparkSession, d: String): DataFrame = {
    val sig = withSignatures(corpus(s, d), nBands = 2, bitsPerBand = 8)
    val bands = (0 until 2).map { b =>
      sig.select(col("vec_id"), col("v"), lit(b).as("band"),
                 col(s"sig_$b").as("bucket"))
    }.reduce(_ unionByName _)
    val a = bands.select(col("band"), col("bucket"), col("vec_id").as("a_id"),
                         col("v").as("av"))
    val b = bands.select(col("band"), col("bucket"), col("vec_id").as("b_id"),
                         col("v").as("bv"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
              NativeExprs.cosine_sim(col("av"), col("bv")).as("cos"))
      .groupBy("a_id", "b_id").agg(first("cos").as("cos"))  // dedup multi-band hits
      .filter(col("cos") >= 0.2)
      .select(col("a_id"), col("b_id"),
              (floor(col("cos") * 100000) / 100000).as("cosine"))
      .orderBy("a_id", "b_id")
  }

  // Exact cosine near-dup pairs (threshold 0.4 — the synthetic vectors are
  // near-orthogonal, see BENCH notes). Oracle-verified all-pairs baseline.
  private def q44CosineNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", NativeExprs.cosine_sim(col("av"), col("bv")))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"),
              (floor(col("cos") * 100000) / 100000).as("cosine"))
      .orderBy("a_id", "b_id")
  }

  /** IVF-style ANN (the scale path alongside q41's LSH): a fixed coarse
    * quantizer (every 10th vector serves as a centroid — deterministic,
    * k-means-free), nprobe=1. Assignment is a broadcast cross-score +
    * argmax (max over (cos, id) structs — deterministic tie-break);
    * search touches only the query's own cell. At 100 TB the corpus is
    * PARTITIONED BY centroid id, so a query reads one cell's partitions
    * — the standard IVF layout. Rows-only check; recall asserted against
    * brute force in SimilaritySpec.
    */
  private def q45AnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cos_c", NativeExprs.cosine_sim(col("embedding"), col("cv")))
      .groupBy("vec_id")
      .agg(max(struct(col("cos_c"), col("c_id"))).as("best"))
      .select(col("vec_id"), col("best.c_id").as("centroid"))
      .join(e, "vec_id")
    val qs = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("centroid").as("q_centroid"),
              col("embedding").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(qs), col("centroid") === col("q_centroid"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", NativeExprs.cosine_sim(col("embedding"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("vec_id").as("n_id"),
              (floor(col("cos") * 100000) / 100000).as("cosine"))
      .orderBy("q_id", "rnk")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_topk"     -> q40CosineTopK _,
    "q41_ann_lsh"         -> q41AnnLsh _,
    "q44_cosine_neardup"  -> q44CosineNearDup _,
    "q45_ann_ivf"         -> q45AnnIvf _,
  )

  override val oracles: Map[String, String] = Map(
    "q40_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         scored AS (SELECT q_id, e.vec_id AS n_id,
                           list_cosine_similarity(e.v, q.qv) AS c
                    FROM e, q WHERE e.vec_id <> q.q_id),
         ranked AS (SELECT q_id, n_id, c,
                           row_number() OVER (PARTITION BY q_id
                             ORDER BY c DESC, n_id) AS rnk
                    FROM scored)
         SELECT q_id, rnk, n_id, floor(c * 100000) / 100000 AS cosine
         FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""",
    "q44_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                floor(list_cosine_similarity(a.v, b.v) * 100000) / 100000 AS cosine
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.4
         ORDER BY a_id, b_id""",
  )
}
