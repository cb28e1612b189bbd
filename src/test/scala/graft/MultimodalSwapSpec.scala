package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decoder SWAP-IN contract (round-13 verdict item 5):
  * prove the documented "swap the decoder" seam accepts a REAL
  * (non-stub) implementation with zero changes to the Spark plumbing.
  * Both decoders here parse genuine file formats in plain JVM code —
  * a binary PGM (P5) image parser and a RIFF/WAV PCM16 parser — so the
  * stub stops being the only consumer of the [[Multimodal.ImageDecoder]]
  * / [[Multimodal.AudioDecoder]] contracts.
  */
class MultimodalSwapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Real binary-PGM (P5) decoder: parses the header (magic, width,
    * height, maxval, single whitespace), then nearest-neighbor
    * downsamples the grayscale raster to dHash's 9x8 grid.
    */
  object PgmDecoder extends Multimodal.ImageDecoder {
    def gray9x8(bytes: Array[Byte]): Array[Int] = {
      // header tokens are ASCII separated by whitespace; pixel data
      // starts one byte after the maxval token
      var i = 0
      def token(): String = {
        while (bytes(i).toChar.isWhitespace) i += 1
        val start = i
        while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
        new String(bytes, start, i - start, "US-ASCII")
      }
      require(token() == "P5", "not a binary PGM")
      val w = token().toInt
      val h = token().toInt
      require(token().toInt == 255, "only 8-bit PGM supported")
      i += 1 // the single whitespace byte before the raster
      Array.tabulate(72) { k =>
        val r = k / 9
        val c = k % 9
        val y = r * h / 8
        val x = c * w / 9
        bytes(i + y * w + x) & 0xFF
      }
    }
  }

  /** Real RIFF/WAV decoder (PCM16 mono little-endian): walks the chunk
    * list to the `data` chunk, then reports per-frame RMS amplitude
    * scaled to 0-255 over `nFrames` equal windows.
    */
  object WavDecoder extends Multimodal.AudioDecoder {
    def frameEnergies(bytes: Array[Byte], nFrames: Int): Array[Int] = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
      var off = 12
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= bytes.length && dataOff < 0) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = buf.getInt(off + 4)
        if (id == "data") { dataOff = off + 8; dataLen = len }
        else off += 8 + len + (len & 1)
      }
      require(dataOff >= 0, "no data chunk")
      val nSamples = dataLen / 2
      Array.tabulate(nFrames) { f =>
        val from = f.toLong * nSamples / nFrames
        val until = (f + 1).toLong * nSamples / nFrames
        if (until <= from) 0
        else {
          var s = 0.0
          var j = from
          while (j < until) {
            val v = buf.getShort(dataOff + 2 * j.toInt).toDouble
            s += v * v
            j += 1
          }
          math.min(255, (math.sqrt(s / (until - from)) / 128.0).toInt)
        }
      }
    }
  }

  private def pgm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ Array.tabulate(w * h)(k => px(k % w, k / w).toByte)
  }

  private def wav(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("perceptualHash accepts a real PGM decoder through the seam unchanged") {
    import spark.implicits._
    // a horizontal gradient brightening left->right sets NO dHash bits
    // (every px(c) < px(c+1)); the reversed gradient sets ALL 64 —
    // end-to-end proof the decoded raster (not the stub byte walk)
    // reached the bit loop
    val brighten = pgm(18, 16, (x, _) => x * 14)
    val darken = pgm(18, 16, (x, _) => 255 - x * 14)
    val media = Seq(
      Multimodal.MediaDoc(1L, brighten),
      Multimodal.MediaDoc(2L, darken)).toDS()
    val got = Multimodal.perceptualHash(media, PgmDecoder)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    // and the swapped decoder genuinely diverges from the stub on the
    // same bytes (the stub walks raw bytes, header included)
    val stub = Multimodal.perceptualHash(media)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stub(2L) != got(2L))
  }

  test("audioFrameEnergies + vadSegments accept a real WAV decoder unchanged") {
    import spark.implicits._
    // 1600 samples: silence, then a loud +/-16384 square wave — RMS
    // 16384/128 = 128 per voiced frame. 8 frames of 200 samples:
    // frames 0-3 silent, 4-7 voiced -> ONE segment, voiced 50%
    val samples = Array.tabulate[Short](1600)(i =>
      if (i < 800) 0 else if ((i / 4) % 2 == 0) 16384 else -16384)
    val media = Seq(Multimodal.MediaDoc(7L, wav(samples))).toDS()
    val frames = Multimodal.audioFrameEnergies(media, nFrames = 8, WavDecoder)
    val es = frames.collect().sortBy(_.frame_idx).map(_.energy).toSeq
    assert(es.take(4).forall(_ == 0), s"silent half must read 0: $es")
    assert(es.drop(4).forall(e => e >= 120 && e <= 128),
      s"square-wave RMS must land at ~128: $es")
    // the SAME downstream operator consumes the real decoder's frames
    val vad = Multimodal.vadSegments(frames.toDF(), threshold = 64)
      .select("doc_id", "n_frames", "voiced_ppm", "n_segments")
      .as[(Long, Long, Long, Long)].head()
    assert(vad == ((7L, 8L, 500000L, 1L)))
  }

  /** Real "video container": frames stored back-to-back, each a
    * complete binary PGM — parsed frame by frame through the
    * [[Multimodal.VideoDecoder]] seam (each raster nearest-neighbor
    * downsampled to dHash's 9x8 grid, the PgmDecoder recipe).
    */
  object ConcatPgmVideoDecoder extends Multimodal.VideoDecoder {
    def frames(bytes: Array[Byte]): Iterator[Array[Int]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var i = 0
      while (i < bytes.length) {
        def token(): String = {
          while (bytes(i).toChar.isWhitespace) i += 1
          val s = i
          while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
          new String(bytes, s, i - s, "US-ASCII")
        }
        require(token() == "P5", "not a binary PGM frame")
        val w = token().toInt
        val h = token().toInt
        require(token().toInt == 255, "only 8-bit PGM supported")
        i += 1 // the single whitespace byte before the raster
        val raster = i
        out += Array.tabulate(72) { k =>
          val r = k / 9
          val c = k % 9
          bytes(raster + (r * h / 8) * w + (c * w / 9)) & 0xFF
        }
        i = raster + w * h
      }
      out.iterator
    }
  }

  test("frameSignatures + frameVoteNearDup accept a real concatenated-PGM " +
      "video decoder unchanged") {
    import spark.implicits._
    // four distinct 18x16 frames with distinct dHash signatures
    val stripes3 = pgm(18, 16, (x, _) => if (x % 3 == 0) 255 else 0)
    val darkenG = pgm(18, 16, (x, _) => 255 - x * 14)
    val brightenG = pgm(18, 16, (x, _) => x * 14)
    // stripe period 2 would vanish under the 9x8 sample (x = 2c is
    // always even); period 4 alternates per sampled column
    val stripes2 = pgm(18, 16, (x, _) => ((x / 2) % 2) * 255)
    // A and B share frames 0 and 1 (re-encoded copy with a swapped
    // final scene); C is unrelated at every index
    val vidA = stripes3 ++ darkenG ++ brightenG
    val vidB = stripes3 ++ darkenG ++ stripes2
    val vidC = darkenG ++ brightenG ++ stripes3
    val media = Seq(Multimodal.MediaDoc(1L, vidA),
      Multimodal.MediaDoc(2L, vidB), Multimodal.MediaDoc(3L, vidC)).toDS()
    val sigs = Multimodal.frameSignatures(media, every = 1,
      ConcatPgmVideoDecoder)
    // the real decode reached the bit loop: A's gradient frames land
    // the known all-zero / all-one signatures at their indexes
    val aSigs = sigs.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(aSigs(1) == ((0xFFFFFFFFL, 0xFFFFFFFFL)), "darken frame = all ones")
    assert(aSigs(2) == ((0L, 0L)), "brighten frame = all zeros")
    // the SAME downstream frame-vote operator (q163's) consumes them
    val pairs = Multimodal.frameVoteNearDup(sigs, "doc_id", minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 2L)),
      s"only the re-encoded copy shares >= 2 frames, got $pairs")
    // and the swapped decoder genuinely diverges from the stub on the
    // same bytes (the stub slices raw bytes, headers included)
    val stub = Multimodal.frameSignatures(media, every = 1)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(stub != sigs.as[(Long, Int, Long, Long)].collect().toSet)
  }

  test("audioContourSignatures + frameBandNearDup accept a real WAV " +
      "decoder unchanged (gain-invariant re-encode + trim both caught)") {
    import spark.implicits._
    // 128 frames x 64 samples of a per-frame square wave; amplitudes
    // 256*((k*7)%23+1) are multiples of 256, so the decoder's RMS/128
    // scaling is EXACT (square-wave RMS = amplitude) and halving the
    // gain keeps every strict energy comparison - the contour's
    // gain-invariance claim, tested through real PCM, not the stub
    def amp(k: Int): Short = (256 * ((k * 7) % 23 + 1)).toShort
    val a = Array.tabulate[Short](128 * 64)(i =>
      (if (i % 2 == 0) amp(i / 64) else (-amp(i / 64)).toShort))
    val b = a.map(s => (s / 2).toShort)            // re-encode at half gain
    val dRot = a.drop(8 * 64) ++ a.take(8 * 64)    // trim/rotate by 8 frames
    val media = Seq(Multimodal.MediaDoc(1L, wav(a)),
      Multimodal.MediaDoc(2L, wav(b)),
      Multimodal.MediaDoc(3L, wav(dRot))).toDS()
    val sigs = Multimodal.audioContourSignatures(
      Multimodal.audioFrameEnergies(media, nFrames = 128, WavDecoder).toDF(),
      stride = 8)
    // 128 frames -> 8 windows (s = 0, 8, ..., 56) per clip
    assert(sigs.groupBy("doc_id").count().as[(Long, Long)].collect()
      .toSet == Set((1L, 8L), (2L, 8L), (3L, 8L)))
    val pairs = Multimodal.frameBandNearDup(sigs, "doc_id",
        maxDist = 3, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    // half-gain B matches A at all 8 positions; the 8-frame rotation D
    // matches both at the 7 shifted alignments (position-free - the
    // exact q163-style vote sees none of the D pairs)
    assert(pairs == Set((1L, 2L, 8L), (1L, 3L, 7L), (2L, 3L, 7L)),
      s"got $pairs")
    val exactVote = Multimodal.frameVoteNearDup(sigs, "doc_id",
        minShared = 2).as[(Long, Long, Long)].collect().toSet
    assert(exactVote == Set((1L, 2L, 8L)),
      s"same-position vote must miss the rotation, got $exactVote")
  }
}
