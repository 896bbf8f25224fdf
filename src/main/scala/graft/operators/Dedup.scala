package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.{NativeExprs, TextExprs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalable near-duplicate detection over `documents` (SURVEY.md §2 rows
  * 11-12 [extension]): MinHash + banded LSH (the 100 TB-scale path for
  * Jaccard near-dup) and SimHash (60-bit content signature).
  *
  * Exact dedup lives in EventOps (q22/q23); the exact pairwise-Jaccard
  * baseline is TextAnalysis.q35. Here:
  *
  *  - q42 MinHash+LSH: 64 hash functions → 16 bands × 4 rows. Candidates
  *    are pairs sharing ≥1 band key (a shuffle keyed by band hash, never
  *    all-pairs); candidates are then verified with EXACT Jaccard, so the
  *    output equals q35's exact pair set whenever LSH recall is 1 — which
  *    is why q35's SQL doubles as this query's DuckDB oracle. Miss
  *    probability for a true 0.9-Jaccard pair: (1 - 0.9⁴)¹⁶ ≈ 4e-8.
  *  - q43 SimHash: per-token 60-bit md5-derived hashes vote bitwise; the
  *    signed sum's sign becomes the signature bit. Near-identical token
  *    multisets flip few votes → small Hamming distance (asserted in
  *    SimilaritySpec); md5 makes the signature cross-engine oracle-checkable.
  *
  * Scale notes: both are linear scans + one shuffle on short keys
  * (band hash / signature). The shingle→minhash work is per-row map-side
  * compute inside codegen (higher-order functions, no UDF). Hot-band
  * skew at extreme scale is bounded by a band-bucket size cap (df-cut),
  * the standard mitigation; not applied at test scale to preserve
  * exactness.
  */
object Dedup extends QueryPack {

  private val nHashes = 64
  private val nBands = 16
  private val rowsPerBand = 4

  /** doc_id + distinct shingle set (native one-pass expression). */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), NativeExprs.word_shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  // MinHash + banded LSH near-dup, exact-Jaccard verified. The 64-minhash
  // → 16-band-key computation is a single native expression (tight loop;
  // the declarative nested-transform form dominated BENCH at 12.9s).
  //
  // Candidate generation: equi-self-join on the exploded (band, bkey)
  // postings — band keys are near-unique for non-dups, so the join output
  // is ≈ self-matches + true collisions. (A groupBy-bucket pairing
  // variant — one shuffle, in-bucket pair expansion — was measured
  // warm-equal but 3s slower cold from codegen of the collect_list +
  // nested-transform pipeline; at extreme scale the switch, plus a
  // bucket-size cap for skew, is mechanical.)
  private def q42MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
    val banded = sh
      .select(col("doc_id"),
              posexplode(NativeExprs.minhash_band_keys(col("sh"), nHashes, nBands))
                .as(Seq("band", "bkey")))
    val cand = banded.select(col("band"), col("bkey"), col("doc_id").as("a_id"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("b_id")),
            Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // exact verification: re-join shingle sets (candidates are tiny —
    // broadcast them so neither verification join shuffles the corpus)
    val aSh = sh.select(col("doc_id").as("a_id"), col("sh").as("ash"))
    val bSh = sh.select(col("doc_id").as("b_id"), col("sh").as("bsh"))
    broadcast(broadcast(cand).join(aSh, "a_id")).join(bSh, "b_id")
      .withColumn("common", size(array_intersect(col("ash"), col("bsh"))))
      .withColumn("jac_raw",
        col("common") / (size(col("ash")) + size(col("bsh")) - col("common")))
      .filter(col("jac_raw") >= 0.8)
      .withColumn("jaccard", floor(col("jac_raw") * 1000) / 1000)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** 60-bit SimHash from whitespace tokens: bit i of the signature is set
    * iff the signed bit-vote over all token hashes is non-negative.
    * The token hash is the top 60 bits of md5 (15 hex chars) — md5 exists
    * in every engine, which makes the signature cross-engine checkable
    * (the DuckDB oracle computes the identical signature). In production
    * swap the per-token hash for xxhash64 (one line) — the vote/signature
    * logic is hash-agnostic, and SimilaritySpec's Hamming-distance property
    * holds for any mixing hash.
    */
  private def q43Simhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr(TextExprs.let1(
          s"transform(${TextExprs.toks}, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS bigint))", "th",
          """aggregate(sequence(0, 59), 0L, (acc, i) ->
               acc + IF(aggregate(th, 0L, (a2, h) ->
                          a2 + IF((shiftrightunsigned(h, i) & 1) = 1, 1L, -1L)) >= 0,
                        shiftleft(1L, i), 0L))""")).as("simhash"))
      .orderBy("doc_id")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_minhash_lsh" -> q42MinhashLsh _,
    "q43_simhash"     -> q43Simhash _,
  )

  // q42's oracle is the EXACT pair set (LSH + exact verification ≡ exact
  // join at recall 1; see scaladoc). q43's oracle recomputes the identical
  // md5-based signature in DuckDB (bit-exact integer arithmetic).
  override val oracles: Map[String, String] = Map(
    "q42_minhash_lsh" -> TextAnalysis.oracles("q35_ngram_jaccard"),
    "q43_simhash" ->
      """WITH t AS (SELECT doc_id,
             [CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
              for tok in string_split_regex(trim(text), '\s+')] AS th
           FROM documents)
         SELECT doc_id,
           CAST(list_sum(
             [CASE WHEN list_sum([CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
                                  for h in th]) >= 0
                   THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
              for i in range(0, 60)]) AS BIGINT) AS simhash
         FROM t ORDER BY doc_id""",
  )
}
