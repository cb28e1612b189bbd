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
