package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the corpus VOCABULARY table (the input to c26's
  * coverage ranking and c59's BPE pair mining): token counts maintained
  * incrementally over a live document ingest as a distributive
  * `groupBy(tok).count()` — no custom state operator, map-side partials
  * within every micro-batch, and the snapshot equals the batch vocab
  * row for row (VocabStreamSpec asserts it, and that the c59 readout
  * over the streamed snapshot equals the batch query bit for bit).
  *
  * State is VOCABULARY-sized, not corpus-sized — Zipf keeps that far
  * below the token stream, but it is unbounded in principle: a web-scale
  * ingest that must cap state uses [[HeavyHitterStream]]'s fixed
  * depth×width sketch instead and accepts approximate counts. This
  * stream is the exact-table path (tokenizer training needs exact
  * counts; it also runs over bounded ingest slices, not forever).
  */
object VocabStream {

  /** (tok, n) for a (possibly streaming) frame of documents — ONE
    * spelling for the batch and streaming vocab, so the two cannot
    * drift.
    */
  def vocabCounts(docs: DataFrame): DataFrame =
    docs.select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))

  /** c59's readout: adjacent char-pair frequencies over a vocab
    * snapshot, weighted by token count — BPE merge candidates. Shared
    * verbatim by the declared batch query (`c59_bpe_pairs`) and the
    * streamed snapshot.
    */
  def bpePairs(vocab: DataFrame, topK: Int): DataFrame =
    vocab.filter(length(col("tok")) >= 2)
      .select(col("tok"), col("n"),
        explode(expr(
          "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n")).as("n_occ"), countDistinct(col("tok")).as("n_types"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(topK)
}
