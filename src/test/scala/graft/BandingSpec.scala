package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Calibration gate for the threshold-derived LSH banding
  * ([[Pipeline.bandingFor]]) and containment probing
  * ([[Pipeline.containmentProbesFor]]).
  *
  * The DuckDB oracle replays the engine's own signature math, so it
  * can NEVER catch a recall defect — these specs (analytic floor +
  * measured capture against brute-force truth on planted corpora) are
  * the only recall gate. The round-7 lesson they pin: fixed k=16/b=4
  * banding captured a J=0.7 pair ~74% of the time, which silently
  * defeated decontamination and leakage-safe splits.
  */
class BandingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bandingFor meets the >= 0.99 recall floor at every operator threshold") {
    // thresholds the shipped operators run at: 0.5 (decontamination /
    // split grouping / q27 family), 0.7 (legacy containment LSH), 0.8
    // (near-dedup default), 0.9 (strict), plus boundary values
    for (t <- Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 1.0)) {
      val (b, r) = Pipeline.bandingFor(t)
      assert(b >= 1 && r >= 1 && b * r <= Pipeline.DefaultSigK,
        s"banding ($b x $r) for J=$t exceeds the DefaultSigK budget")
      val recall = Pipeline.bandingRecall(t, b, r)
      assert(recall >= 0.99,
        f"recall floor broken at J=$t%.2f: ($b x $r) captures $recall%.4f")
    }
  }

  test("bandingFor pins the calibrations the oracle SQL is generated from") {
    // the q26/q27/q61/q80/q84/q91/q104/q108 oracle CTEs band at
    // bandingFor(0.5); a calibration change MUST regenerate them in
    // lockstep (they do — the CTE interpolates these values — but this
    // pin makes any change loud in review)
    assert(Pipeline.bandingFor(0.5) == ((40, 3)))
    assert((PipelineQueries.lshBands05, PipelineQueries.lshRows05) == ((40, 3)))
    assert(PipelineQueries.lshK05 == 120)
    assert(PipelineQueries.lshK05 <= Pipeline.DefaultSigK,
      "shared signature frames must be wide enough for the 0.5 banding")
    // near-dedup default threshold
    assert(Pipeline.bandingFor(0.8) == ((18, 6)))
    // q92's containment probe count: single-hit and (the round-9
    // default) 2-hit calibrations — both hold the >= 99.5% capture
    // floor at their own threshold
    assert(Pipeline.containmentProbesFor(0.7) == 5)
    assert(Pipeline.containmentProbesFor(0.7, minHits = 2) == 7)
    assert(Pipeline.containmentProbesFor(0.9, minHits = 2) == 4)
    // degenerate: full containment needs exactly minHits probes
    assert(Pipeline.containmentProbesFor(1.0, minHits = 2) == 2)
  }

  test("bandingFor maximizes rows-per-band (selectivity) within the budget") {
    for (t <- Seq(0.5, 0.7, 0.8, 0.9)) {
      val (b, r) = Pipeline.bandingFor(t)
      // one more row per band must not fit the budget at the target
      val p1 = math.pow(t, r + 1)
      val b1 = math.ceil(math.log1p(-0.995) / math.log1p(-p1)).toInt
      assert((r + 1).toLong * b1 > Pipeline.DefaultSigK,
        s"J=$t: ($b1 x ${r + 1}) would fit but bandingFor chose ($b x $r)")
    }
  }

  test("measured blocking recall on planted constant-Jaccard corpora") {
    import spark.implicits._
    // pair i at EXACT trigram Jaccard j: both docs share a 16-word
    // prefix (14 fully-interior shared trigrams) and carry distinct
    // tails sized so |A| = |B| = n trigrams with J = 14/(2n-14).
    // Vocabulary is disjoint across pairs, so truth = the planted
    // pairs exactly and cross-pair candidates are impossible.
    def plant(tag: String, nPairs: Int, tailWords: Int): Seq[(Long, String)] =
      (0 until nPairs).flatMap { i =>
        val prefix = (0 until 16).map(w => s"${tag}p${i}w$w")
        def doc(side: String) =
          (prefix ++ (0 until tailWords).map(w => s"${tag}$side${i}t$w"))
            .mkString(" ")
        Seq((2L * i, doc("a")), (2L * i + 1, doc("b")))
      }
    def measuredRecall(docs: Seq[(Long, String)], bandingAt: Double): Double = {
      val df = docs.toDF("doc_id", "text")
      val sig = Dedup.shingleSignatures(df, "doc_id", "text")
      val (b, r) = Pipeline.bandingFor(bandingAt)
      val got = Pipeline.lshCandidatePairs(sig, "doc_id", b * r, b)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val truth = docs.map(_._1).filter(_ % 2 == 0)
        .map(a => (a, a + 1)).toSet
      (got & truth).size.toDouble / truth.size
    }
    // J = 0.5 exactly (23 words -> 21 trigrams, 14 shared -> 14/28),
    // measured AT the threshold — the hardest point of the guarantee
    val r05 = measuredRecall(plant("x", 40, 7), bandingAt = 0.5)
    info(f"measured recall @ J=0.50 under banding(0.5) (40 pairs): $r05%.3f " +
      f"(analytic ${Pipeline.bandingRecall(0.5, 40, 3)}%.4f)")
    assert(r05 >= 0.95, f"blocking recall at the threshold fell to $r05%.3f")
    // J = 0.7 exactly (19 words -> 17 trigrams, 14 shared -> 14/20)
    // at ITS OWN banding: analytic floor 0.996, so a single miss in 40
    // is within model (measured 0.975 on this fixed corpus)
    val y = plant("y", 40, 3)
    val r07own = measuredRecall(y, bandingAt = 0.7)
    info(f"measured recall @ J=0.70 under banding(0.7) (40 pairs): $r07own%.3f " +
      f"(analytic ${Pipeline.bandingRecall(0.7, 20, 4)}%.4f)")
    assert(r07own >= 0.9, f"recall at J=0.7 under its own banding: $r07own%.3f")
    // the same J=0.7 pairs under the 0.5 banding (the decontamination
    // operating point of the round-7 defect): capture is analytically
    // ~1 - 5e-8 — every pair must block
    val r07 = measuredRecall(y, bandingAt = 0.5)
    info(f"measured recall @ J=0.70 under banding(0.5) (40 pairs): $r07%.3f")
    assert(r07 == 1.0,
      f"J=0.7 capture under the 0.5 banding is analytically ~1-5e-8; got $r07%.3f")
  }

  test("decontamination captures every planted leak at its threshold (brute-force truth)") {
    import spark.implicits._
    // 30 train docs each at J ~= 0.7 vs its own test doc — the round-7
    // defect class (a J=0.7 contaminated doc deterministically
    // surviving the gate). Every one must be removed.
    def prefix(i: Int) = (0 until 16).map(w => s"d${i}w$w")
    val train = (0 until 30).map { i =>
      (i.toLong, (prefix(i) ++ Seq(s"d${i}ta", s"d${i}tb", s"d${i}tc")).mkString(" "))
    }.toDF("doc_id", "text")
    val test = (0 until 30).map { i =>
      (1000L + i, (prefix(i) ++ Seq(s"d${i}ua", s"d${i}ub", s"d${i}uc")).mkString(" "))
    }.toDF("doc_id", "text")
    val kept = Dedup.decontaminate(train, test, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect()
    assert(kept.isEmpty,
      s"contaminated train docs survived the gate: ${kept.toSeq.sorted}")
  }

  test("estimatedPairs: unbiased signature estimate within 3.5 sd of true Jaccard") {
    import spark.implicits._
    // 40 pairs at J=0.5 and 40 at J=0.7 (the BandingSpec fixtures),
    // default 128-slot signatures: sd of the estimator is
    // sqrt(J(1-J)/128) ~ 0.044, so a 0.155 tolerance is ~3.5 sd
    def plant(tag: String, nPairs: Int, tailWords: Int, idBase: Long) =
      (0 until nPairs).flatMap { i =>
        val prefix = (0 until 16).map(w => s"${tag}p${i}w$w")
        def doc(side: String) =
          (prefix ++ (0 until tailWords).map(w => s"${tag}$side${i}t$w"))
            .mkString(" ")
        Seq((idBase + 2L * i, doc("a")), (idBase + 2L * i + 1, doc("b")))
      }
    val docs = (plant("e5", 40, 7, 0L) ++ plant("e7", 40, 3, 1000L))
      .toDF("doc_id", "text")
    val sig = Dedup.shingleSignatures(docs, "doc_id", "text")
    // gate at 0.3: ~4.5 sd below the lowest true J, so no planted
    // pair's estimate can fall below it (and J=0 cross pairs sit at ~0)
    val got = Dedup.estimatedPairs(sig, "doc_id", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    def truth(idBase: Long) = (0 until 40).map(i =>
      (idBase + 2L * i, idBase + 2L * i + 1))
    // every planted pair blocks (banding at 0.4 covers J >= 0.5) and
    // its estimate sits within tolerance of the TRUE Jaccard
    for ((pair, j) <- truth(0L).map(_ -> 0.5) ++ truth(1000L).map(_ -> 0.7)) {
      val est = got.get(pair)
      assert(est.isDefined, s"planted pair $pair (J=$j) not blocked/estimated")
      val e = est.get / 1e6
      assert(math.abs(e - j) <= 0.155,
        f"estimate $e%.3f strays from true J=$j for $pair")
    }
    // cross-pair estimates (disjoint vocab, J=0) never pass the gate
    val crossPair = got.keys.find { case (a, b) =>
      (a < 1000) != (b < 1000) || (a / 2 != b / 2)
    }
    assert(crossPair.isEmpty, s"spurious pair above threshold: $crossPair")
  }

  test("containment df cap drops hot-shingle index entries (documented trade-off)") {
    import spark.implicits._
    // 30 long docs all embed boilerplate phrase P; one short doc IS
    // exactly P (containment 1.0 in every long doc, blockable ONLY via
    // P's shingles — which have df 31). Under the default cap (10000)
    // all 30 pairs surface; with the cap below the df the hot entries
    // leave the index, the probe join's fanout is bounded, and the
    // pairs are lost — exactly the recall caveat the scaladoc states.
    val p = "common boiler plate text"
    val docs = ((0 until 30).map(i =>
        (i.toLong, s"$p unique$i tail$i words$i here$i")) :+
      (99L, p)).toDF("doc_id", "text")
    val sig = Dedup.shingleSignatures(docs, "doc_id", "text")
    val full = Dedup.containmentPairs(sig, "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == (0 until 30).map(i => (i.toLong, 99L)).toSet,
      s"uncapped should find all 30 short-in-long pairs, got $full")
    val capped = Dedup.containmentPairs(sig, "doc_id", threshold = 0.9,
        maxShingleDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.isEmpty,
      s"df cap 10 must drop the df-31 boiler shingles, got $capped")
  }

  test("containment probing captures planted low-Jaccard containment pairs") {
    import spark.implicits._
    // 20 planted (short, long) pairs: the short doc's shingles are
    // 100% contained in the long one's, Jaccard ~0.2 — invisible to
    // Jaccard-tuned LSH by design, the exact case the inverted-index
    // probing exists for
    val docs = (0 until 20).flatMap { i =>
      val short = (0 until 12).map(w => s"c${i}w$w")
      val long = short ++ (0 until 40).map(w => s"c${i}x$w")
      Seq((2L * i, short.mkString(" ")), (2L * i + 1, long.mkString(" ")))
    }.toDF("doc_id", "text")
    val sig = Dedup.shingleSignatures(docs, "doc_id", "text")
    val got = Dedup.containmentPairs(sig, "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (0 until 20).map(i => (2L * i, 2L * i + 1)).toSet
    assert(got == truth,
      s"missed: ${truth -- got}; spurious: ${got -- truth}")
  }
}
