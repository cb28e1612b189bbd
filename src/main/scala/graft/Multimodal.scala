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

  /** The image-decode SEAM: bytes -> the 9x8 grayscale grid (72 values
    * 0-255, row-major: entry r*9+c) that dHash compares. Implementations
    * must be Serializable (they ship to executors inside the
    * mapPartitions closure). [[StubImageDecoder]] is the default;
    * a real deployment passes an ImageIO/libjpeg-backed instance and
    * NOTHING else changes — proven by the swap-in spec, which drives
    * [[perceptualHash]] with a plain-JVM PGM decoder.
    */
  trait ImageDecoder extends Serializable {
    def gray9x8(bytes: Array[Byte]): Array[Int]
  }

  /** The deterministic stub: "pixel" k = byte at `(k*37) mod len`
    * (37 coprime to typical lengths spreads the 72 samples over the
    * payload; empty payloads read 0). Oracle-replayable.
    */
  object StubImageDecoder extends ImageDecoder {
    def gray9x8(b: Array[Byte]): Array[Int] =
      Array.tabulate(72)(k =>
        if (b.length == 0) 0 else b((k * 37) % b.length) & 0xFF)
  }

  /** The audio-decode SEAM: bytes -> `nFrames` fixed-rate frame
    * energies (0-255). [[StubAudioDecoder]] is the default; a real
    * deployment passes a PCM/RMS implementation — the swap-in spec
    * drives [[audioFrameEnergies]] with a plain-JVM WAV decoder.
    */
  trait AudioDecoder extends Serializable {
    def frameEnergies(bytes: Array[Byte], nFrames: Int): Array[Int]
  }

  /** The deterministic stub: frame i's "energy" = byte at
    * `(i*37) mod len` (empty payloads read 0). Oracle-replayable.
    */
  object StubAudioDecoder extends AudioDecoder {
    def frameEnergies(b: Array[Byte], nFrames: Int): Array[Int] =
      Array.tabulate(nFrames)(i =>
        if (b.length == 0) 0 else b((i * 37) % b.length) & 0xFF)
  }

  /** The video-decode SEAM: bytes -> one 9x8 grayscale grid (72
    * values 0-255, the [[ImageDecoder]] grid shape) PER FRAME, in
    * frame order. [[StubVideoDecoder]] is the default; a real
    * deployment passes an ffmpeg/container-demux implementation and
    * the frame-dHash + frame-vote pipeline downstream does not change
    * — proven by the swap-in spec, which drives [[frameSignatures]]
    * and [[frameVoteNearDup]] with a plain-JVM concatenated-PGM
    * parser.
    */
  trait VideoDecoder extends Serializable {
    def frames(bytes: Array[Byte]): Iterator[Array[Int]]
  }

  /** The deterministic stub: frame count from [[FakeCodec.decode]],
    * the payload split into equal byte slices, frame i's "pixel" k =
    * slice byte at `(k*37) mod sliceLen` (empty slices read 0).
    * Oracle-replayable — q163's oracle replays exactly this.
    */
  object StubVideoDecoder extends VideoDecoder {
    def frames(b: Array[Byte]): Iterator[Array[Int]] = {
      val (_, _, nFrames) = FakeCodec.decode(b)
      val sliceLen = b.length / nFrames
      (0 until nFrames).iterator.map { i =>
        Array.tabulate(72)(k =>
          if (sliceLen == 0) 0
          else b(i * sliceLen + (k * 37) % sliceLen) & 0xFF)
      }
    }
  }

  /** Classic dHash bit fold over a 9x8 grayscale grid: bit (r*8+c) =
    * 1 iff pixel(r,c) > pixel(r,c+1), split (lo, hi) 32/32 so the
    * oracle never folds 64-bit signed values. Shared by
    * [[perceptualHash]] (whole image) and [[frameSignatures]]
    * (per video frame).
    */
  private def dhash64(g: Array[Int]): (Long, Long) = {
    var lo = 0L
    var hi = 0L
    var bit = 0
    while (bit < 64) {
      val r = bit / 8
      val c = bit % 8
      if (g(r * 9 + c) > g(r * 9 + c + 1)) {
        if (bit < 32) lo |= 1L << bit
        else hi |= 1L << (bit - 32)
      }
      bit += 1
    }
    (lo, hi)
  }

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
    * perturbs at most 2 bits). Real deployments pass an
    * [[ImageDecoder]] doing an actual decode+resize (the swap-in spec
    * does, with a plain-JVM PGM parser); everything downstream — the
    * (lo, hi) 32-bit split that avoids 64-bit signed folds in the
    * oracle, the pigeonhole blocking, the hamming verify — is the real
    * contract, shared verbatim with [[graft.Pipeline.simhash64Pairs]].
    *
    * Output columns are named `simhash_lo`/`simhash_hi` so the frame
    * feeds `simhash64Pairs` directly: hamming-near pairs at distance
    * <= 3 via the 4x16-bit chunk equi-join — never an all-pairs
    * comparison. Empty payloads hash to (0, 0).
    */
  def perceptualHash(ds: Dataset[MediaDoc],
                     decoder: ImageDecoder = StubImageDecoder): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here (shared with decode)
      it.map { m =>
        val (lo, hi) = dhash64(decoder.gray9x8(m.content))
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

  /** STUB image embedding: `dims` components in [-1, 1), component d
    * reading "pixel" d exactly like [[perceptualHash]] (byte at offset
    * `(d*37) mod len`) and centering it: `(px - 128) / 128.0` — exact
    * dyadic rationals, so every engine computes identical doubles. A
    * real deployment swaps this body for a vision-encoder call; the
    * contract — bytes in, unit-scale fixed-width vector out, computed
    * per-partition next to the blobs — is the real shape. Output:
    * `(doc_id, img_vec: array<double>)`.
    */
  def stubImageEmbedding(ds: Dataset[MediaDoc], dims: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition encoder init would go here
      it.map { m =>
        val b = m.content
        val v = Array.tabulate(dims) { d =>
          val px = if (b.length == 0) 0 else b((d * 37) % b.length) & 0xFF
          (px - 128) / 128.0
        }
        (m.doc_id, v)
      }
    }.toDF("doc_id", "img_vec")
  }

  /** CLIP-style caption-image agreement gate: cosine between the
    * media's ([[stubImageEmbedding]]) vector and its caption's text
    * embedding; rows below `minCos` drop — the multimodal-corpus
    * filter that removes mismatched caption/image pairs (the LAION
    * recipe). One equi-join on the id (both sides co-partition by it
    * at scale), cosine via the fused codegen kernel, scan-side filter.
    * Output: `(doc_id, cosine)` for the surviving pairs.
    */
  def crossModalAgreement(media: Dataset[MediaDoc], textVecs: DataFrame,
                          idCol: String, vecCol: String,
                          minCos: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    stubImageEmbedding(media)
      .join(textVecs.select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_tv")),
        col("doc_id") === col("_id"))
      .select(col("doc_id"),
        graft.plans.VectorExpressions.cosineSim(col("img_vec"), col("_tv"))
          .as("cosine"))
      .filter(col("cosine") >= minCos)
  }

  /** Per-sampled-frame 64-bit dHash. Unlike [[perceptualHash]] (whole
    * payload), each frame reads its own DISJOINT byte slice — frame i
    * of an n-frame payload owns `[i*len/n, (i+1)*len/n)`, the way real
    * codecs lay frames out — so an edit localized in the payload
    * perturbs only the frames whose bytes it touches. "Pixel" k of
    * frame i is the slice byte at `(k*37) mod sliceLen`; bits are the
    * same 9x8 horizontal-gradient comparisons as [[perceptualHash]].
    * Output: `(doc_id, frame_idx, sig_lo, sig_hi)`, one row per
    * sampled (every `every`-th) frame.
    */
  def frameSignatures(ds: Dataset[MediaDoc], every: Int = 2,
                      decoder: VideoDecoder = StubVideoDecoder): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.flatMap { m =>
        decoder.frames(m.content).zipWithIndex.collect {
          case (g, i) if i % every == 0 =>
            val (lo, hi) = dhash64(g)
            (m.doc_id, i, lo, hi)
        }
      }
    }.toDF("doc_id", "frame_idx", "sig_lo", "sig_hi")
  }

  /** One stub-decoded audio frame: index + energy (0-255). */
  case class AudioFrame(doc_id: Long, frame_idx: Int, energy: Int)

  /** Audio frame energies through the [[AudioDecoder]] seam:
    * `nFrames` fixed-rate frames per payload. The default
    * [[StubAudioDecoder]] reads frame i's "energy" as the byte at
    * `(i*37) mod len` (the [[frameSignatures]] sampling recipe; empty
    * payloads read 0); a real deployment passes an RMS-over-PCM
    * decoder instead (the swap-in spec does, with a plain-JVM WAV
    * parser) — the partition-wise decode, the (doc, frame, energy)
    * fan-out schema, and the co-partitioning with the source doc are
    * the contract and do not change.
    */
  def audioFrameEnergies(ds: Dataset[MediaDoc], nFrames: Int = 48,
                         decoder: AudioDecoder = StubAudioDecoder)
      : Dataset[AudioFrame] = {
    import ds.sparkSession.implicits._
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.flatMap { m =>
        val es = decoder.frameEnergies(m.content, nFrames)
        (0 until nFrames).iterator.map(i => AudioFrame(m.doc_id, i, es(i)))
      }
    }
  }

  /** Voice-activity summary over [[audioFrameEnergies]] output: per
    * doc, frame count, voiced fraction (ppm, energy >= threshold), and
    * SEGMENT count (maximal voiced runs — the number a VAD splitter
    * would cut the clip into). The run detection is one per-doc window
    * over the frame index — bounded by frames-per-clip, never
    * corpus-sized. The speech-ratio gate audio curation runs before
    * paying for transcription.
    */
  def vadSegments(frames: DataFrame, threshold: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("_voiced", col("energy") >= threshold)
      .withColumn("_seg_start",
        when(col("_voiced") &&
          !coalesce(lag("_voiced", 1).over(w), lit(false)), 1L)
          .otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_frames"),
        expr("CAST(sum(CASE WHEN _voiced THEN 1 ELSE 0 END) * 1000000L" +
          " div count(1) AS BIGINT)").as("voiced_ppm"),
        sum("_seg_start").cast("long").as("n_segments"))
  }

  /** CONTOUR signatures over [[audioFrameEnergies]] output — the audio
    * analog of [[frameSignatures]]: sliding 65-frame windows at
    * `stride` produce one 64-bit signature each, bit k = 1 iff the
    * energy RISES between window frames k and k+1. Comparing adjacent
    * energies (the dHash trick in time) makes the signature invariant
    * to uniform gain — a re-encode or volume normalization that scales
    * every frame's RMS leaves every bit unchanged — while a localized
    * edit flips only the bits whose comparisons touch the edited
    * frames. Split (lo, hi) 32/32 like [[frameSignatures]], so
    * [[frameBandNearDup]] consumes the output UNCHANGED: position-free
    * banded matching then catches both re-encodes (Hamming <= 3) and
    * trims/remuxes (same windows at shifted positions).
    *
    * Scale shape: one bounded per-doc aggregate (clips are the unit —
    * the collected energy list is `nFrames` ints, never corpus-sized),
    * then a scan-side window expansion of `(nFrames - 65) / stride + 1`
    * rows per clip; docs shorter than 65 frames emit nothing. No
    * corpus-sized shuffle beyond the per-doc groupBy. Each signature
    * half is an UNROLLED flat bitwise-OR of 32 compare-and-shift terms
    * — straight-line long arithmetic inside whole-stage codegen,
    * exactly the [[graft.ops.Layout.zorderKeyN]] fix: the earlier form
    * folded `aggregate(sequence(...), ...)` with a lambda, which
    * materialized a 32-element array PER WINDOW and paid the
    * interpreted-lambda dispatch 64 times per window (measured on
    * q305: the fold was the query's dominant term at sf1).
    */
  def audioContourSignatures(frames: DataFrame, stride: Int = 8): DataFrame =
    contourWindowSignatures(
      frames.groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.expr(
          "transform(sort_array(collect_list(" +
            "struct(frame_idx, energy))), f -> f.energy)").as("_es")),
      stride)

  /** The contour-signature KERNEL shared verbatim by the batch path
    * ([[audioContourSignatures]], which assembles `_es` with a per-doc
    * groupBy) and the streaming twin
    * ([[graft.streaming.Streams.streamingAudioBandCandidates]], where
    * each arriving clip IS one row, so `_es` needs no stateful
    * aggregate): input `(doc_id, _es: array<int>, carry...)`, output
    * one `(doc_id, carry..., frame_idx, sig_lo, sig_hi)` row per
    * 65-frame window at `stride`. Extra input columns (the stream's
    * event-time `ts`) pass through untouched.
    */
  def contourWindowSignatures(withEs: DataFrame, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // bit j of the half starting at `base`: energy rises between
    // window frames (base+j) and (base+j+1) — 1-indexed element_at
    def contourHalf(base: Int): String = (0 until 32).map { j =>
      val k = base + j
      s"shiftleft(IF(element_at(_es, frame_idx + ${k + 2}) > " +
        s"element_at(_es, frame_idx + ${k + 1}), 1L, 0L), $j)"
    }.mkString("(", " | ", ")")
    val carry = withEs.columns.filter(c => c != "doc_id" && c != "_es")
    withEs
      .filter(size(col("_es")) >= 65)
      .select((col("doc_id") +: carry.map(col)) :+
        explode(expr(s"transform(sequence(0, CAST((size(_es) - 65)" +
          s" div $stride AS INT)), w -> w * $stride)")).as("frame_idx") :+
        col("_es"): _*)
      .select((col("doc_id") +: carry.map(col)) :+ col("frame_idx") :+
        expr(contourHalf(0)).as("sig_lo") :+
        expr(contourHalf(32)).as("sig_hi"): _*)
  }

  /** Video near-dup by FRAME VOTE: two videos pair when at least
    * `minShared` sampled frame positions carry the identical frame
    * dHash — re-encodes and localized edits keep most frames'
    * signatures, so the vote catches what whole-payload hashing
    * ([[MediaFeatures.content_hash]], [[perceptualHash]]) misses.
    * Blocking is the `(frame_idx, sig)` equi-join — only same-position
    * identical-signature frames meet, never all video pairs. Constant
    * frames (black, title cards) make hot signature keys at corpus
    * scale: keys seen on more than `maxSigDf` frames are dropped from
    * candidacy (the q92 df-cap discipline — a capped key contributes
    * no votes; raise the cap when black-frame-only overlap matters).
    * Output: `(a_id, b_id, n_shared)` with `a_id < b_id`.
    */
  def frameVoteNearDup(frames: DataFrame, idCol: String, minShared: Int,
                       maxSigDf: Int = 1000): DataFrame = {
    import org.apache.spark.sql.functions._
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val keyCols = Seq("frame_idx", "sig_lo", "sig_hi")
    val keyed = frames.select(
      (col(idCol) +: keyCols.map(col)): _*)
    val ok = keyed.join(
      keyed.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxSigDf)
        .select(keyCols.map(col): _*),
      keyCols)
    ok.select(col(idCol).as("a_id"), col("frame_idx"), col("sig_lo"), col("sig_hi"))
      .join(ok.select(col(idCol).as("b_id"), col("frame_idx"), col("sig_lo"), col("sig_hi")),
        keyCols)
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(countDistinct(col("frame_idx")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** CROSS-CONTAINER video near-dup: [[frameVoteNearDup]]'s exact
    * `(position, signature)` vote misses the two real-world mutations
    * a video corpus is full of — re-encodes (a couple of dHash bits
    * flip per frame) and trims/remuxes (the same frames sit at
    * DIFFERENT positions). This variant is the banded-LSH analog over
    * [[frameSignatures]] output: each frame's 64-bit signature splits
    * into 4 sixteen-bit chunks (2 per half — the
    * [[graft.Pipeline.simhash64Pairs]] pigeonhole: two signatures
    * within Hamming distance <= 3 MUST agree on at least one chunk),
    * candidate frame pairs meet POSITION-FREE on `(chunk_idx, chunk)`,
    * survivors verify with the exact popcount distance <= `maxDist`,
    * and a video pair reports when at least `minShared` DISTINCT
    * a-side frames found a close partner.
    *
    * Scale shape: banding is a scan-side projection (4 posting rows
    * per frame — never all frame pairs); chunk keys hotter than
    * `maxChunkDf` drop from candidacy before the self-join (the q92
    * df-cap discipline — black frames and title cards are the
    * degenerate keys; a capped key contributes no votes, so the
    * result is a documented LOWER bound there); the verify is
    * scan-side bit_count on the joined rows, and the vote is one
    * partial-combinable aggregate over the deduped matches. maxDist
    * <= 3 is structural (the 4-chunk pigeonhole's guarantee).
    * Output: `(a_id, b_id, n_close)` with `a_id < b_id`.
    */
  /** The 4x16-bit chunk split shared verbatim by [[frameBandNearDup]]
    * and the streaming twin's bucket keys
    * ([[graft.streaming.Streams.streamingAudioBandCandidates]]): adds
    * `(c, chunk)` — chunk index 0-3 and that sixteen-bit slice of the
    * 64-bit `(sig_lo, sig_hi)` signature — one row per chunk, all
    * other columns passed through. The pigeonhole this banding rides:
    * two signatures within Hamming distance <= 3 MUST agree on at
    * least one chunk.
    */
  def sigChunks(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    frames.withColumn("c", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", when(col("c") < 2,
          expr("shiftright(sig_lo, c * 16) & 65535"))
        .otherwise(expr("shiftright(sig_hi, (c - 2) * 16) & 65535")))
  }

  def frameBandNearDup(frames: DataFrame, idCol: String, maxDist: Int,
                       minShared: Int, maxChunkDf: Int = 1000): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxDist >= 0 && maxDist <= 3,
      s"4-chunk pigeonhole banding covers distance <= 3, got $maxDist")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxChunkDf >= 1, s"maxChunkDf must be >= 1, got $maxChunkDf")
    val chunked = sigChunks(frames.select(col(idCol).as("_vid"),
      col("frame_idx"), col("sig_lo"), col("sig_hi")))
    val ok = chunked.join(
      chunked.groupBy("c", "chunk").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxChunkDf)
        .select("c", "chunk"),
      Seq("c", "chunk"))
    val matches = ok.select(col("_vid").as("a_id"),
        col("frame_idx").as("_fa"), col("sig_lo").as("_la"),
        col("sig_hi").as("_ha"), col("c"), col("chunk"))
      .join(ok.select(col("_vid").as("b_id"), col("frame_idx").as("_fb"),
          col("sig_lo").as("_lb"), col("sig_hi").as("_hb"),
          col("c"), col("chunk")),
        Seq("c", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .filter(expr(
        s"bit_count(_la ^ _lb) + bit_count(_ha ^ _hb) <= $maxDist"))
      .select("a_id", "b_id", "_fa", "_fb").distinct()
    matches.groupBy("a_id", "b_id")
      .agg(countDistinct(col("_fa")).cast(org.apache.spark.sql.types
        .LongType).as("n_close"))
      .filter(col("n_close") >= minShared)
  }
}
