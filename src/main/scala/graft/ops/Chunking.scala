package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline.words

/** Token-window document chunking — the retrieval/RAG preparation step
  * between a cleaned corpus and an embedding index: fixed-size token
  * windows with overlap, plus chunk-level dedup with canonical
  * back-references (storage dedup for the chunk store).
  *
  * Everything is scan-side token arithmetic (the explode multiplies
  * rows by ~len/stride, not by content) or one md5-keyed shuffle; no
  * joins against the corpus, no driver state.
  */
object Chunking {

  /** Explode each document into overlapping token windows:
    * `chunk_idx = 0, 1, ...`, chunk i covering tokens
    * `[i*stride + 1, i*stride + size]` (stride = size - overlap).
    * Chunk count is `max(1, ceil((len - overlap) / stride))` — the
    * final chunk holds the tail (and may be shorter), and no chunk is
    * emitted whose tokens are all already covered by its predecessor.
    * Output: (idCol, chunk_idx, chunk, n_tok). A document shorter than
    * `size` yields exactly one chunk.
    *
    * Deterministic by construction (pure positional slicing), so chunk
    * identities are stable across runs — the property chunk-level
    * caches and [[chunkDedupMap]] back-references depend on.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    docs
      .select(col(idCol), words(col(textCol)).as("_w"))
      .select(col(idCol), col("_w"),
        explode(sequence(lit(0), expr(
          s"greatest((size(_w) - $overlap + $stride - 1) div $stride, 1) - 1")))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast(LongType).as("chunk_idx"),
        concat_ws(" ", slice(col("_w"),
          col("chunk_idx") * stride + 1, lit(size))).as("chunk"),
        // `size` the param shadows functions.size here — qualify
        org.apache.spark.sql.functions
          .size(slice(col("_w"), col("chunk_idx") * stride + 1, lit(size)))
          .cast(LongType).as("n_tok"))
  }

  /** CONTENT-DEFINED chunking (the rsync/CDC family): a chunk boundary
    * falls after token `i` whenever the 60-bit hash of the last
    * `window` tokens ≡ 0 (mod `modulus`) — boundaries are decided by
    * CONTENT, not position, so an insertion near the start re-syncs at
    * the next content boundary and every later chunk is byte-identical
    * to the original's. That re-sync is the property positional
    * chunking ([[chunk]]) and fixed-width span dedup
    * ([[TextStats.stripDuplicateSpans]]) fundamentally lack: one
    * leading edit shifts ALL their windows. Expected chunk length ≈
    * `modulus` tokens (+ the window warm-up).
    *
    * Pure scan-side HOFs (boundary scan + slicing — the explode
    * multiplies rows by ~len/modulus); deterministic md5-derived
    * hashes, so chunk identities replay across runs/engines/retries.
    * Output: (idCol, chunk_idx, chunk, n_tok). Docs with no interior
    * boundary yield one chunk.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 3, modulus: Int = 8): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    docs
      .select(col(idCol), words(col(textCol)).as("_w"))
      // boundary AFTER token i, i in [window, n-1] (never after the
      // last token — the tail chunk is always non-empty)
      .withColumn("_starts", expr(
        s"""concat(array(1), transform(filter(
              CASE WHEN size(_w) > $window
                   THEN sequence($window, size(_w) - 1) ELSE array() END,
              i -> cast(conv(substring(md5(array_join(
                     slice(_w, i - ${window - 1}, $window), ' ')), 1, 15),
                     16, 10) as bigint) % ${modulus}L = 0L),
            b -> b + 1))"""))
      .select(col(idCol), col("_w"), explode(expr(
        s"""transform(sequence(1, size(_starts)), j -> struct(
              cast(j - 1 as bigint) as chunk_idx,
              slice(_w, element_at(_starts, j),
                (IF(j < size(_starts), element_at(_starts, j + 1),
                    size(_w) + 1)) - element_at(_starts, j)) as toks))"""))
        .as("_c"))
      .select(col(idCol), col("_c.chunk_idx").as("chunk_idx"),
        array_join(col("_c.toks"), " ").as("chunk"),
        org.apache.spark.sql.functions.size(col("_c.toks"))
          .cast(LongType).as("n_tok"))
  }

  /** Per-doc CDC duplication report: the token share of each doc
    * sitting in chunks whose content appears >= 2 times corpus-wide —
    * the storage/near-dup savings estimate that SURVIVES edits
    * (because [[cdcChunks]] boundaries re-sync). One digest-keyed
    * window over the chunk frame + one doc-keyed aggregate. Output:
    * (id, n_chunks, n_tok, dup_tok, dup_ppm).
    */
  def cdcDupStats(docs: DataFrame, idCol: String, textCol: String,
                  window: Int = 3, modulus: Int = 8): DataFrame =
    cdcChunks(docs, idCol, textCol, window, modulus)
      .withColumn("_df",
        count(lit(1)).over(Window.partitionBy(md5(col("chunk")))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        sum(col("n_tok")).cast(LongType).as("n_tok"),
        sum(when(col("_df") >= 2, col("n_tok")).otherwise(0L))
          .cast(LongType).as("dup_tok"))
      .withColumn("dup_ppm",
        expr("(1000000L * dup_tok) div greatest(n_tok, 1L)"))

  /** Chunk-level dedup map: for every chunk whose text also appears as
    * an earlier chunk (lexicographically first (doc, idx) on the md5
    * digest), emit the back-reference — the "store once, point
    * everywhere else" form of chunk-store dedup. Non-duplicate chunks
    * produce no row.
    *
    * One shuffle on the digest; the canonical pick is a struct-min
    * window (identical lexicographic struct ordering on both engines).
    */
  def chunkDedupMap(docs: DataFrame, idCol: String, textCol: String,
                    size: Int = 64, overlap: Int = 16): DataFrame = {
    val ch = chunk(docs, idCol, textCol, size, overlap)
    val w = Window.partitionBy(md5(col("chunk")))
    ch.withColumn("_canon",
        min(struct(col(idCol), col("chunk_idx"))).over(w))
      .filter(col(s"_canon.$idCol") =!= col(idCol) ||
        col("_canon.chunk_idx") =!= col("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        col(s"_canon.$idCol").as("canon_doc"),
        col("_canon.chunk_idx").as("canon_idx"))
  }
}
