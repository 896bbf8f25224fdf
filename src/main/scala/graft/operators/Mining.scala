package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.{NativeExprs, TopKAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-corpus MINING operators — aligning two embedding/document
  * collections rather than querying one. The LLM-training-data use is
  * parallel-data mining: pair every item of side A with its best match
  * in side B, scored robustly against hubness, which is how the large
  * public bitext corpora (CCMatrix / CCAligned / LASER mining) are
  * built. The reference engine has no vector surface (SURVEY.md §2
  * "Explicit absences"); this pack extends the mandated
  * training-data-pipeline tier alongside [[Similarity]] and
  * [[Projection]].
  */
object Mining extends QueryPack {

  /** Neighborhood size for the margin denominator — the k in the ratio
    * margin's mean-of-top-k normalization. */
  private val marginK = 4

  /** Keep a mined pair only when its cosine exceeds the mean of both
    * endpoints' neighborhoods (ratio margin > 1) — the standard mining
    * cut: a pair no better than its sides' ambient similarity is hub
    * noise, not alignment. */
  private val marginThreshold = 1.0

  /** MARGIN-BASED PAIR MINING — the ratio-margin criterion of
    * margin-based bitext mining (Artetxe & Schwenk's ratio margin, the
    * CCMatrix scoring rule): for candidate pair (x, y),
    *
    *   margin(x, y) = cos(x, y) / ((dA(x) + dB(y)) / 2),
    *
    * where dA(x) = mean cosine of x to its `marginK` nearest neighbors
    * on the OTHER side (and symmetrically dB). Raw cosine argmax is
    * hub-biased — a vector near the centroid of the other side wins
    * every pairing — and the margin denominator is precisely the local
    * hubness estimate that cancels it. Sides here are the embedding
    * labels split in half (label < 5 vs >= 5 — two ~equal collections,
    * the test stand-in for two languages / two snapshots / two
    * modalities); the output is each A-item's best B-match by margin,
    * kept only above [[marginThreshold]].
    *
    * Shape: ONE A×B cosine relation feeds three consumers — the
    * pairwise scores, the A-side top-k densities, the B-side top-k
    * densities (bounded-heap TopKAgg, no window sort); densities are
    * side-sized aggregates, so both join back to the pair relation as
    * broadcasts. The neighborhood mean is the rank-ordered left fold of
    * the TopKAgg array (÷ k), so it is bit-reproducible in the oracle
    * via `list_reduce(list(c ORDER BY rnk))` — the repo's proven
    * cross-engine float-sum pattern. At test scale the A×B relation is
    * a broadcast nested-loop (|B| rows broadcast); at 100 TB the mining
    * stack replaces exactly that relation with the q86 IVF-PQ probed
    * candidate set (forward + backward top-k per item, the standard
    * mined-candidate union) and the SAME margin scoring runs over it
    * unchanged — densities come free from the probe results. Vectors
    * never shuffle: the pair relation carries (a_id, b_id, cos) only.
    */
  private def q126MarginMine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"))
    val a = e.filter(col("label") < 5)
      .select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = e.filter(col("label") >= 5)
      .select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val pairs = a.crossJoin(broadcast(b))
      .withColumn("c", NativeExprs.cosine_sim(col("av"), col("bv")))
      .select("a_id", "b_id", "c")
    def density(side: String): DataFrame = pairs.groupBy(side)
      .agg(TopKAgg.top_k_by_score(col("c"),
             col(if (side == "a_id") "b_id" else "a_id"), marginK).as("top"))
      .select(col(side),
              (aggregate(expr("transform(top, x -> x.score)"),
                         lit(0.0), (acc, x) => acc + x) / marginK)
                .as(s"d_$side"))
    pairs
      .join(broadcast(density("a_id")), "a_id")
      .join(broadcast(density("b_id")), "b_id")
      .withColumn("margin",
        col("c") / ((col("d_a_id") + col("d_b_id")) / 2.0))
      .groupBy("a_id")
      .agg(TopKAgg.top_k_by_score(col("margin"), col("b_id"), 1).as("top"))
      .select(col("a_id"), col("top")(0)("id").as("b_id"),
              col("top")(0)("score").as("m"))
      .filter(col("m") >= marginThreshold)
      .select(col("a_id"), col("b_id"),
              (floor(col("m") * 100000) / 100000).as("margin"))
      .orderBy("a_id")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_margin_mine" -> q126MarginMine _,
  )

  override val oracles: Map[String, String] = Map(
    // the identical computation: A×B cosines, rank-ordered top-k left
    // fold for both densities (list_reduce seeds with the first element;
    // Spark's 0.0 seed is IEEE-identical since 0.0 + x == x), one
    // division chain per pair, top-1 by (margin DESC, b_id)
    "q126_margin_mine" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                     FROM embeddings),
          a AS (SELECT vec_id AS a_id, v AS av FROM e WHERE label < 5),
          b AS (SELECT vec_id AS b_id, v AS bv FROM e WHERE label >= 5),
          pr AS (SELECT a_id, b_id, list_cosine_similarity(av, bv) AS c
                 FROM a, b),
          ra AS (SELECT a_id, b_id, c,
                        row_number() OVER (PARTITION BY a_id
                          ORDER BY c DESC, b_id) AS rnk FROM pr),
          da AS (SELECT a_id,
                        list_reduce(list(c ORDER BY rnk), (x, y) -> x + y)
                          / $marginK AS d_a
                 FROM ra WHERE rnk <= $marginK GROUP BY a_id),
          rb AS (SELECT a_id, b_id, c,
                        row_number() OVER (PARTITION BY b_id
                          ORDER BY c DESC, a_id) AS rnk FROM pr),
          db AS (SELECT b_id,
                        list_reduce(list(c ORDER BY rnk), (x, y) -> x + y)
                          / $marginK AS d_b
                 FROM rb WHERE rnk <= $marginK GROUP BY b_id),
          m AS (SELECT pr.a_id, pr.b_id,
                       pr.c / ((da.d_a + db.d_b) / 2) AS margin
                FROM pr JOIN da USING (a_id) JOIN db USING (b_id)),
          t AS (SELECT a_id, b_id, margin,
                       row_number() OVER (PARTITION BY a_id
                         ORDER BY margin DESC, b_id) AS rnk FROM m)
          SELECT a_id, b_id, floor(margin * 100000) / 100000 AS margin
          FROM t WHERE rnk = 1 AND margin >= $marginThreshold
          ORDER BY a_id""",
  )
}
