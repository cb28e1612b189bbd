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
