package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column plus typed metadata —
  * the layout a 100 TB training-data pipeline uses (content-addressed
  * blobs co-partitioned with their features; the decode stage runs
  * per-partition so one task amortizes codec init over a whole batch).
  *
  * The actual codecs are not available in this environment, so
  * [[FakeCodec.decode]] is a clearly-marked deterministic STUB standing
  * in for image decode; everything around it — schema, Dataset typing,
  * partition-wise batching, feature extraction shape — is real and is
  * exercised by the correctness gate (the stub is deterministic, so the
  * DuckDB oracle can replay it).
  */
object Multimodal {

  /** A media document: id + raw bytes (image/audio/video payload). */
  case class MediaDoc(doc_id: Long, content: Array[Byte])

  /** Decoded per-media features. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      content_hash: String)

  /** STUB decoder: deterministic fake in place of a real image/audio
    * codec (none is installed here). Real deployments swap this body
    * for e.g. an ImageIO/ffmpeg call; the signature (bytes in, typed
    * features out) and the partition-wise call pattern are the real
    * contract.
    *
    * The fake "dimensions" read the first two BYTES; the DuckDB oracle
    * (q35) derives the same numbers via ascii() CODE POINTS, so the
    * gate's equality contract is explicitly limited to ASCII payloads
    * (which the testdata corpus is). A multi-byte leading character
    * would diverge — irrelevant to real codecs, whose parsing is
    * byte-defined.
    */
  object FakeCodec {
    def decode(b: Array[Byte]): (Int, Int, Int) = {
      // short payloads: a missing byte decodes as 0 (dimension 1) — the
      // stub must not throw, and this matches the oracle, whose
      // 1 + ascii(substr(text, i, 1)) yields 1 on an empty substring
      val width = 1 + (if (b.length > 0) b(0) & 0xFF else 0)
      val height = 1 + (if (b.length > 1) b(1) & 0xFF else 0)
      val nFrames = 1 + (b.length % 7)
      (width, height, nFrames)
    }
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** One sampled frame of a media document. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame sampling: emit every `every`-th frame of each media doc as
    * its own row — the fan-out shape video pipelines use (one row per
    * sampled frame, co-partitioned with the source doc). The frame
    * "decode" is the same deterministic stub; the flatMap-per-partition
    * plumbing and output schema are the real contract.
    */
  def sampleFrames(ds: Dataset[MediaDoc], every: Int = 2): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { m =>
        val (_, _, nFrames) = FakeCodec.decode(m.content)
        (0 until nFrames by every).iterator.map { i =>
          Frame(m.doc_id, i, md5hex(m.content ++ Array(i.toByte)))
        }
      }
    }
  }

  /** 64-bit dHash-style PERCEPTUAL fingerprint of a media payload —
    * the content near-dup signature for images (robust to small pixel
    * edits, unlike [[MediaFeatures.content_hash]]'s exact md5).
    *
    * Classic dHash: sample the decoded image down to a 9x8 grayscale
    * grid, then bit (r*8+c) = 1 iff pixel(r,c) > pixel(r,c+1) — 64
    * horizontal-gradient comparisons. The DECODE is this file's
    * deterministic stub (no codec here): "pixel" k is the byte at
    * offset (k*37) mod byte_len (37 is coprime to typical lengths, so
    * the 72 samples spread over the payload; a single-byte edit
    * perturbs at most 2 bits). Real deployments replace the sampling
    * with an actual decode+resize; everything downstream — the
    * (lo, hi) 32-bit split that avoids 64-bit signed folds in the
    * oracle, the pigeonhole blocking, the hamming verify — is the real
    * contract, shared verbatim with [[graft.Pipeline.simhash64Pairs]].
    *
    * Output columns are named `simhash_lo`/`simhash_hi` so the frame
    * feeds `simhash64Pairs` directly: hamming-near pairs at distance
    * <= 3 via the 4x16-bit chunk equi-join — never an all-pairs
    * comparison. Empty payloads hash to (0, 0).
    */
  def perceptualHash(ds: Dataset[MediaDoc]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here (shared with decode)
      it.map { m =>
        val b = m.content
        def px(k: Int): Int =
          if (b.length == 0) 0 else b((k * 37) % b.length) & 0xFF
        var lo = 0L
        var hi = 0L
        var bit = 0
        while (bit < 64) {
          val r = bit / 8
          val c = bit % 8
          if (px(r * 9 + c) > px(r * 9 + c + 1)) {
            if (bit < 32) lo |= 1L << bit
            else hi |= 1L << (bit - 32)
          }
          bit += 1
        }
        (m.doc_id, lo, hi)
      }
    }.toDF("doc_id", "simhash_lo", "simhash_hi")
  }

  /** Decode + feature-extract, one codec instance per partition.
    * `mapPartitions` (not `map`) so codec setup cost amortizes across
    * the partition's rows — the standard Spark batch shape for
    * expensive per-row native calls.
    */
  def decodeFeatures(ds: Dataset[MediaDoc]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { m =>
        val (w, h, f) = FakeCodec.decode(m.content)
        MediaFeatures(m.doc_id, m.content.length.toLong, w, h, f, md5hex(m.content))
      }
    }
  }
}
