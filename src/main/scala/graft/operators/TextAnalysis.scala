package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2 row 13
  * [extension]) — the LLM-training-pipeline surface: token counting,
  * per-language stats, quality scoring, language-ID heuristic, document
  * fingerprinting, and n-gram Jaccard near-dup detection.
  *
  * Everything is built-in Spark SQL (split / regexp / higher-order array
  * functions) — codegen'd, no UDFs, no driver-side loops.
  *
  * Scale notes:
  *  - all per-doc queries are embarrassingly parallel map work on the scan;
  *  - q35 (near-dup) avoids the O(n²) cross join via the standard inverted
  *    index: explode distinct shingles → equi-join on shingle → count
  *    common per pair. Work is Σ df(shingle)² — bounded on real corpora by
  *    a document-frequency cut on hot shingles (see Dedup.minHashLsh for
  *    the LSH-banded variant that caps candidate generation at any scale).
  */
object TextAnalysis extends QueryPack {

  private val toksExpr = graft.functions.TextExprs.toks
  private val shinglesExpr = graft.functions.TextExprs.shingles

  // Token counting: whitespace tokens + a BPE-ish regex tokenization
  // (letter runs | digit runs | single punctuation), plus avg word length.
  private def q30Tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        expr(s"size($toksExpr)").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"),
        // floor-truncate, don't round: ratios of small ints can land exactly
        // on a rounding midpoint (4.725), where Spark's round (decimal
        // re-interpretation via Double.toString) and DuckDB's (raw binary)
        // disagree. floor(x*100)/100 is pure IEEE → bit-identical engines.
        (floor(length(regexp_replace(col("text"), "\\s+", ""))
          / expr(s"size($toksExpr)") * 100) / 100).as("avg_word_len"))
      .orderBy("doc_id")

  // Per-language corpus stats.
  private def q31LangStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("n_chars"), 2).as("avg_chars"),
           sum(expr(s"size($toksExpr)")).as("total_tokens"))
      .orderBy("lang")

  private val stopList = "('the','a','of','and','in','to')"

  // Quality scoring: length/stopword/char-ratio heuristics → one score.
  private def q32Quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        expr(s"size($toksExpr)").as("n_tokens"),
        expr(s"size(filter($toksExpr, t -> t IN $stopList))").as("n_stop"))
      .withColumn("stop_ratio",
        floor(col("n_stop") / col("n_tokens") * 1000) / 1000)
      .withColumn("quality_score",
        floor((lit(0.5) * least(lit(1.0), col("n_tokens") / 100.0)
             + lit(0.5) * (lit(1.0) - col("n_stop") / col("n_tokens"))) * 1000) / 1000)
      .select("doc_id", "n_tokens", "stop_ratio", "quality_score")
      .orderBy("doc_id")

  /** Language-ID heuristic: marker-word hit counts per language plus an
    * ASCII-letter ratio. Declarative (no UDF); verified in ScalaTest on
    * real multilingual sentences — no SQL oracle (the heuristic's CASE
    * cascade is its own spec). Rows-only check from the driver.
    */
  private[graft] val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que", "por"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "qui", "pas"),
  )

  private[graft] def langIdScored(df: DataFrame): DataFrame = {
    val scored = langMarkers.foldLeft(df.withColumn("toks", expr(toksExpr))) {
      case (acc, (lang, markers)) =>
        val set = markers.map(m => s"'$m'").mkString("(", ",", ")")
        acc.withColumn(s"score_$lang",
          expr(s"size(filter(toks, t -> t IN $set))"))
    }
    // CJK detection: any non-ASCII high-codepoint chars dominate.
    val nonAscii = length(regexp_replace(col("text"), "[\\x00-\\x7F]", ""))
    scored
      .withColumn("score_cjk", nonAscii)
      .withColumn("predicted_lang",
        when(col("score_cjk") > length(col("text")) * 0.3, lit("zh"))
          .otherwise(
            // deterministic argmax: strict-greater cascade in fixed order
            Seq("en", "de", "es", "fr").map(l => col(s"score_$l"))
              .zip(Seq("en", "de", "es", "fr"))
              .foldLeft((lit(0), lit("und"))) { case ((bestScore, bestLang), (score, lang)) =>
                (greatest(bestScore, score),
                 when(score > bestScore, lit(lang)).otherwise(bestLang))
              }._2))
  }

  private def q33LangId(s: SparkSession, d: String): DataFrame =
    langIdScored(Tables.documents(s, d))
      .select(col("doc_id"), col("predicted_lang"),
              col("score_en"), col("score_de"), col("score_es"),
              col("score_fr"), col("score_cjk"))
      .orderBy("doc_id")

  // Document fingerprint: min of md5 over word-3-gram shingles (MinHash
  // with k=1 — a locality-sensitive content fingerprint; near-identical
  // docs collide with probability = their Jaccard similarity).
  private def q34Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
              graft.functions.NativeExprs.word_shingles(col("text")).as("sh"))
      .select(col("doc_id"),
              expr("array_min(transform(sh, x -> md5(x)))").as("fingerprint"),
              size(col("sh")).as("n_shingles"))
      .orderBy("doc_id")

  // N-gram Jaccard near-dup pairs via inverted shingle index (no cross
  // join): explode → equi-join on shingle → common counts → Jaccard.
  private def q35NgramJaccard(s: SparkSession, d: String): DataFrame = {
    def exploded(role: String): DataFrame =
      Tables.documents(s, d)
        .select(col("doc_id"),
                graft.functions.NativeExprs.word_shingles(col("text")).as("sh"))
        .select(col("doc_id").as(s"${role}_id"),
                size(col("sh")).as(s"${role}sz"),
                explode(col("sh")).as("s"))
    exploded("a").join(exploded("b"), Seq("s"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "asz", "bsz")
      .agg(count(lit(1)).as("common"))
      .withColumn("jac_raw", col("common") / (col("asz") + col("bsz") - col("common")))
      .filter(col("jac_raw") >= 0.8)
      .withColumn("jaccard", floor(col("jac_raw") * 1000) / 1000)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  // Edit distance between adjacent documents' 80-char prefixes (capped so
  // the O(len²) DP stays bounded; Spark and DuckDB both implement the
  // classic Levenshtein count).
  private def q36EditDistance(s: SparkSession, d: String): DataFrame = {
    val a = Tables.documents(s, d)
      .select(col("doc_id").as("a_id"), substring(col("text"), 1, 80).as("a_txt"))
    val b = Tables.documents(s, d)
      .select(col("doc_id").as("b_id"), substring(col("text"), 1, 80).as("b_txt"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"), col("b_id"),
              levenshtein(col("a_txt"), col("b_txt")).cast("long").as("edit_dist"))
      .orderBy("a_id")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_edit_distance" -> q36EditDistance _,
    "q30_tokens"        -> q30Tokens _,
    "q31_lang_stats"    -> q31LangStats _,
    "q32_quality"       -> q32Quality _,
    "q33_langid"        -> q33LangId _,
    "q34_fingerprint"   -> q34Fingerprint _,
    "q35_ngram_jaccard" -> q35NgramJaccard _,
  )

  override val oracles: Map[String, String] = Map(
    "q36_edit_distance" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS edit_dist
         FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         ORDER BY a_id""",
    "q30_tokens" ->
      """SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
         len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens,
         floor(length(regexp_replace(text, '\s+', '', 'g'))
               / len(string_split_regex(trim(text), '\s+')) * 100) / 100 AS avg_word_len
         FROM documents ORDER BY doc_id""",
    "q31_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
         sum(len(string_split_regex(trim(text), '\s+'))) AS total_tokens
         FROM documents GROUP BY lang ORDER BY lang""",
    "q32_quality" ->
      """SELECT doc_id, n_tokens,
         floor(n_stop / n_tokens * 1000) / 1000 AS stop_ratio,
         floor((0.5 * least(1.0, n_tokens / 100.0)
              + 0.5 * (1.0 - n_stop / n_tokens)) * 1000) / 1000 AS quality_score
         FROM (SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                   t -> t IN ('the','a','of','and','in','to'))) AS n_stop
               FROM documents) ORDER BY doc_id""",
    "q34_fingerprint" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3 THEN
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
             ELSE [] END) AS shingles
           FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                 FROM documents))
         SELECT doc_id, list_min([md5(x) for x in shingles]) AS fingerprint,
                len(shingles) AS n_shingles
         FROM sh ORDER BY doc_id""",
    "q35_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3 THEN
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
             ELSE [] END) AS shingles
           FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                 FROM documents)),
         ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS s FROM sh),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS asz, b.sz AS bsz,
                  count(*) AS common
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT a_id, b_id,
                floor(common / (asz + bsz - common) * 1000) / 1000 AS jaccard
         FROM pairs
         WHERE common / (asz + bsz - common) >= 0.8
         ORDER BY a_id, b_id""",
  )
}
