package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines: language-ID heuristic,
  * quality features, token counting (whitespace + BPE-ish subwords), and
  * rolling-window document fingerprinting.
  *
  * Determinism: every per-language/per-source aggregate sums INTEGERS and
  * divides once at the end — no double summation anywhere, so results
  * are bit-identical to the DuckDB oracle.
  */
object TextAnalysis {

  /** Stopword-vote language-ID heuristic. Votes are counted per marker
    * list; prediction is the argmax with a fixed precedence order
    * (en > de > fr > es), 'und' when nothing matches.
    */
  def langId(docs: DataFrame): DataFrame = {
    def hits(words: Seq[String]) =
      sum(when(col("tok").isInCollection(words), 1L).otherwise(0L))
    val toks = docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val scored = toks.groupBy(col("doc_id"), col("lang"))
      .agg(hits(Seq("the", "a", "of", "and", "is")).as("en_hits"),
        hits(Seq("der", "die", "das", "und", "ist")).as("de_hits"),
        hits(Seq("le", "la", "et", "les", "est")).as("fr_hits"),
        hits(Seq("el", "los", "las", "y", "es")).as("es_hits"))
    val predicted = when(
      col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
        col("en_hits") >= col("es_hits") && col("en_hits") > 0, "en")
      .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits") &&
        col("de_hits") > 0, "de")
      .when(col("fr_hits") >= col("es_hits") && col("fr_hits") > 0, "fr")
      .when(col("es_hits") > 0, "es")
      .otherwise("und")
    scored.select(col("lang"), predicted.as("predicted"))
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality features rolled up per lang: integer sums only, ratios
    * derived once at the end.
    */
  def qualityByLang(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("lang"), col("n_chars"),
      size(expr("filter(split(text, ' '), t -> t <> '')")).cast("long").as("n_tokens"),
      when(col("n_chars") >= 250, 1L).otherwise(0L).as("is_long"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("is_long")).as("n_long"))
      .select(col("lang"), col("n_docs"), col("total_tokens"), col("total_chars"),
        (col("total_tokens").cast("double") / col("n_docs")).as("avg_tokens"),
        (col("total_chars").cast("double") / col("total_tokens")).as("avg_tok_len"),
        (col("n_long").cast("double") / col("n_docs")).as("share_long"))
      .orderBy(col("lang"))
  }

  /** Token counting per lang: whitespace words plus a BPE-ish subword
    * estimate (ceil(len/4) pieces per word — the "~4 chars per token"
    * rule).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("(length(tok) + 3) div 4")).as("n_subwords"),
        sum(length(col("tok")).cast("long")).as("n_word_chars"))
      .orderBy(col("lang"))
  }

  /** Keep/drop curation decision per document with the FIRST matching
    * drop reason (too_short → too_long → low_alpha → repetitive → keep),
    * rolled up per (lang, reason). Every predicate compares INTEGERS
    * (ratios as cross-multiplied int comparisons, e.g. `alpha·10 <
    * chars·6` for "alpha share < 60%"), so the decision is bit-exact
    * across engines — a filter that flaps between runs re-shuffles the
    * training corpus.
    */
  /** Per-document keep/drop decision with its first-match reason — the
    * row-level surface a curation pipeline filters on (c17 aggregates
    * it; PipelineSpec composes it with dedup and budget admission).
    * Returns the input columns plus `reason`.
    */
  def qualityDecisions(docs: DataFrame): DataFrame = {
    val nTokens = size(expr("filter(split(text, ' '), t -> t <> '')")).cast("long")
    val nDistinct = size(array_distinct(expr("filter(split(text, ' '), t -> t <> '')")))
      .cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    docs.withColumn("reason",
      when(col("n_chars") < 50, "too_short")
        .when(col("n_chars") > 5000, "too_long")
        .when(nAlpha * 10 < col("n_chars") * 6, "low_alpha")
        .when(nDistinct * 10 < nTokens * 3, "repetitive")
        .otherwise("keep"))
  }

  def qualityFilter(docs: DataFrame): DataFrame =
    qualityDecisions(docs)
      .groupBy(col("lang"), col("reason"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("reason"))

  /** Redaction accounting: how many characters a scrub pattern removes
    * per group — the audit trail a PII-scrub pass must emit (counting is
    * exact; the redacted text itself is `regexp_replace(text, pattern,
    * replacement)` applied the same way).
    */
  def redactionStats(df: DataFrame, group: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column, pattern: String): DataFrame =
    df.select(group.as("grp"),
      (length(text) - length(regexp_replace(text, pattern, ""))).cast("long").as("removed"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("removed")).as("n_chars_redacted"))
      .orderBy(col("grp"))

  /** Per-lang repetition profile: a doc's repetition is its share of
    * repeated tokens (total − distinct); `n_repetitive` counts docs at
    * ≥ 50% via the cross-multiplied integer comparison
    * `(tot − dis)·100 ≥ 50·tot` — bit-exact across engines, no float
    * ratio. The within-doc twin of the corpus-level dedup suite: heavy
    * internal repetition is the classic low-quality-generation signal a
    * training filter drops.
    */
  def repetitionProfile(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("tot"), countDistinct(col("tok")).as("dis"))
    per.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when((col("tot") - col("dis")) * 100 >= col("tot") * 50, 1L)
          .otherwise(0L)).as("n_repetitive"),
        sum(col("tot")).as("sum_tokens"),
        sum(col("dis")).as("sum_distinct"))
      .orderBy(col("lang"))
  }

  /** Rolling-window fingerprint: the min md5 over sliding 4-token
    * shingles (winnowing-style); groups sharing a fingerprint are
    * near-dup candidates.
    */
  def fingerprintGroups(docs: DataFrame): DataFrame = {
    // 4-token shingles via the native TokenNgrams kernel (skip-empty
    // mode, r3): docs with < 4 tokens produce an empty array, which the
    // generator drops — identical rows to the filtered-HOF formulation
    // (kept as the spec's model; the oracle is unchanged).
    val shingles = docs
      .select(col("doc_id"),
        explode(org.apache.spark.sql.GraftBridge.column(
          graft.functions.TokenNgrams(
            org.apache.spark.sql.GraftBridge.expression(col("text")),
            n = 4, maxStarts = Int.MaxValue, skipEmpty = true))).as("sh"))
    val fp = shingles.groupBy(col("doc_id"))
      .agg(min(md5(col("sh").cast("binary"))).as("fingerprint"))
    fp.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("doc_id").cast("string")))).as("doc_ids"))
      .filter(col("n_docs") > 1)
      .orderBy(col("fingerprint"))
  }
}
