package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TextExpressions, VectorExpressions}

/** Property-based equivalence for the native kernels vs their
  * HOF/aggregate reference formulations, over adversarial generated
  * inputs the corpus can't provide: unicode tokens, empty strings,
  * heavy duplication, single-token docs, degenerate vectors.
  * (ScalaCheck generators driven by fixed seeds — scalatestplus is not
  * in the offline cache, so sampling is done directly.)
  */
class KernelPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // tokens: ascii words, unicode, empty strings, repeats
  private val genToken: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(8)),
    2 -> Gen.oneOf("emas", "λambda", "北京", "ñandú", "✓"),
    1 -> Gen.const(""),
    2 -> Gen.oneOf("dup", "dup", "other"))

  private val genDoc: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genToken))

  private def sampleDocs(seed: Long, count: Int): Seq[Seq[String]] =
    (0 until count).map(i =>
      genDoc.apply(Gen.Parameters.default, Seed(seed + i)).getOrElse(Nil))

  test("text kernels == HOF forms on generated unicode/degenerate token arrays") {
    import spark.implicits._
    val docs = sampleDocs(seed = 7, count = 300)
    val df = docs.map(_.mkString(" ")).toDF("text")
      .select(Pipeline.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3) // shingle-caller contract
      .select(col("w"), Pipeline.wordShingles(col("w"), 3).as("sh"),
        Pipeline.wordShinglesHof(col("w"), 3).as("sh_hof"))
      .select(
        col("sh"), col("sh_hof"),
        TextExpressions.md5Hash32Array(col("sh")).as("h"),
        transform(col("sh"), Pipeline.wordHash32(_)).as("h_hof"),
        Pipeline.minhashSignature(col("sh"), 16).as("sig"),
        Pipeline.minhashSignatureHof(col("sh"), 16).as("sig_hof"),
        Pipeline.rollingHash(col("w")).as("rh"),
        Pipeline.rollingHashHof(col("w")).as("rh_hof"),
        graft.plans.VectorExpressions.simHash32(col("w")).as("sim"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
      assert(r.getSeq[Long](4) == r.getSeq[Long](5))
      assert(r.getLong(6) == r.getLong(7))
    }
  }

  test("simhash32 kernel == explode+groupBy on generated docs") {
    import spark.implicits._
    val docs = sampleDocs(seed = 21, count = 200)
    val df = docs.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val native = Pipeline.simhash32(df, "doc_id", "text")
    val ref = Pipeline.simhash32ViaExplode(df, "doc_id", "text")
    // explode drops docs whose token array is empty; split never yields
    // an empty array (""-doc -> [""]), so counts match
    assert(native.count() == df.count())
    assert(native.except(ref).count() == 0)
    assert(ref.except(native).count() == 0)
  }

  test("GroupedTopK == window formulation on generated data incl. float edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val genRow: Gen[(Double, Double)] = for {
      key <- Gen.oneOf(Gen.choose(0.0, 3.0).map(k => math.floor(k)),
        Gen.oneOf(0.0, -0.0, Double.NaN))
      v <- Gen.oneOf(Gen.choose(-100.0, 100.0),
        Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0))
    } yield (key, v)
    val rows = (0 until 400).map(i =>
      genRow.apply(Gen.Parameters.default, Seed(1000L + i)).get)
    val df = rows.toDF("g", "v").repartition(7)
    val custom = graft.plans.GroupedTopK.perKey(df, Seq("g"), "v", k = 3)
      .collect()
      .map(r => (java.lang.Double.doubleToLongBits(r.getDouble(0)),
                 java.lang.Double.doubleToLongBits(r.getDouble(1)))).sorted.toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val viaWindow = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3).drop("_rn")
      .collect()
      .map(r => (java.lang.Double.doubleToLongBits(r.getDouble(0)),
                 java.lang.Double.doubleToLongBits(r.getDouble(1)))).sorted.toSeq
    assert(custom == viaWindow)
  }

  test("rhp_bucket kernel == HOF on generated vectors incl. zero/negatives") {
    import spark.implicits._
    val genVec: Gen[Seq[Double]] = Gen.oneOf(
      Gen.listOfN(64, Gen.choose(-1.0, 1.0)),
      Gen.const(List.fill(64)(0.0)),            // all-zero: every proj == 0
      Gen.listOfN(64, Gen.oneOf(-1.0, 1.0)))    // sign-saturated
    val vecs = (0 until 200).map(i =>
      genVec.apply(Gen.Parameters.default, Seed(100L + i)).get)
    val df = vecs.toDF("v")
    val rows = df.select(
      VectorExpressions.rhpBucket(col("v"), 64, 4).as("native"),
      Pipeline.rhpBucketHof(col("v"), 64, 4).as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("chunking reconstructs every generated doc exactly (coverage + no redundancy)") {
    import spark.implicits._
    // invariant: tokens == chunk0 ++ (chunks 1..n-1 each dropping the
    // `overlap` tokens its predecessor already emitted) — full
    // coverage, no gap, no redundant window, for adversarial token
    // lists (unicode, empty strings, single-token docs)
    for ((size, overlap) <- Seq((4, 2), (5, 0), (7, 3))) {
      val docs = sampleDocs(424200L + size * 31 + overlap, 60)
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val byDoc = graft.ops.Chunking.chunk(df, "doc_id", "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val expected = text.split(" ", -1).toSeq
        val chunks = byDoc(id).sortBy(_._2)
        // indices dense from 0; n_tok matches each chunk's token count
        assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
        chunks.foreach { case (_, _, c, n) =>
          assert(c.split(" ", -1).length.toLong == n) }
        val rebuilt = chunks.head._3.split(" ", -1).toSeq ++
          chunks.tail.flatMap(_._3.split(" ", -1).drop(overlap).toSeq)
        assert(rebuilt == expected,
          s"doc $id (size=$size overlap=$overlap) must reconstruct")
      }
    }
  }

  test("pageRank equals a sequential integer reference on generated graphs") {
    import spark.implicits._
    // random directed graphs incl. sources, sinks, and cycles — the
    // shapes the round-8 review found the distributed loop mishandling
    def edgesFor(seed: Long, nNodes: Int, nEdges: Int): Seq[(Long, Long)] = {
      val g = Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0, nNodes - 1), Gen.choose(0, nNodes - 1)))
      g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
        .collect { case (a, b) if a != b => (a.toLong, b.toLong) }
        .distinct
    }
    def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val in = edges.groupBy(_._2)
      var pr = nodes.map(_ -> 1000L).toMap
      for (_ <- 1 to iters)
        pr = nodes.map { v =>
          val s = in.getOrElse(v, Nil).map { case (u, _) => pr(u) / out(u) }.sum
          v -> (150L + (850L * s) / 1000L)
        }.toMap
      pr
    }
    for (seed <- Seq(11L, 22L, 33L)) {
      val edges = edgesFor(seed, nNodes = 12, nEdges = 30)
      val got = graft.ops.Graph.pageRank(edges.toDF("src", "dst"), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPageRank(edges, 4), s"seed $seed mismatch")
    }
  }

  test("winnowing guarantee holds on generated docs with planted shared runs") {
    import spark.implicits._
    // non-empty single-word tokens (the words() contract: no inner
    // empty tokens, so the driver-side reference split agrees)
    val tok: Gen[String] = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    def toks(seed: Long, n: Int): Seq[String] =
      Gen.listOfN(n, tok).apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
    // 40 pairs: doc A = prefixA ++ shared ++ suffixA, doc B likewise
    // with different padding; shared run length 7 = window + k - 1
    val cases = (0 until 40).map { i =>
      val shared = toks(1000 + i, 7)
      val a = toks(2000 + i, i % 5) ++ shared ++ toks(3000 + i, (i + 2) % 4)
      val b = toks(4000 + i, (i + 3) % 6) ++ shared ++ toks(5000 + i, i % 3)
      (2L * i, a.mkString(" "), 2L * i + 1, b.mkString(" "))
    }
    val docs = cases.flatMap { case (ia, a, ib, b) => Seq((ia, a), (ib, b)) }
      .toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the MOSS guarantee: every planted >= w+k-1 shared run yields at
    // least one shared selected fingerprint, wherever it sits
    cases.foreach { case (ia, a, ib, _) =>
      assert((fps(ia) & fps(ib)).nonEmpty,
        s"pair ($ia,$ib) shares a 7-token run but no fingerprint: $a")
    }
    // and the selection equals the driver-side reference winnow
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    cases.foreach { case (ia, a, _, _) =>
      val w = a.split(" ")
      val grams = (0 to w.length - 4).map(j => h32(w.slice(j, j + 4).mkString(" ")))
      val ref = (0 to grams.length - 4).map { j =>
        (j until j + 4).map(x => grams(x) * 1000000L + (x + 1)).min / 1000000L
      }.toSet
      assert(fps(ia) == ref, s"selection mismatch for doc $ia")
    }
  }

  test("cdcChunks reassemble every generated doc exactly, in order") {
    import spark.implicits._
    // plain word tokens (split-on-space contract: no empties)
    val genWord = Gen.frequency(
      5 -> Gen.alphaLowerStr.map(s => if (s.isEmpty) "w" else s.take(6)),
      2 -> Gen.oneOf("dup", "dup", "alpha", "beta"))
    val genWordsDoc = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, genWord))
    val docs = (0 until 200).map(i =>
      (i.toLong, genWordsDoc.apply(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(List("w")).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val ch = graft.ops.Chunking.cdcChunks(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val byDoc = ch.groupBy(_._1)
    docs.foreach { case (id, text) =>
      val cs = byDoc(id).sortBy(_._2)
      assert(cs.map(_._3).mkString(" ") == text,
        s"doc $id does not reassemble from its chunks")
      assert(cs.forall(_._4 >= 1), s"doc $id has an empty chunk")
      assert(cs.map(_._2).toSeq == cs.indices.map(_.toLong),
        s"doc $id chunk indices not dense")
    }
  }

  test("luhnScreen agrees with a driver-side Luhn reference on random digit runs") {
    import spark.implicits._
    def luhnRef(s: String): Boolean =
      s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    val genRun = for {
      n <- Gen.choose(11, 21) // straddles the 13..19 candidate band
      ds <- Gen.listOfN(n, Gen.choose(0, 9))
    } yield ds.mkString
    val runs = (0 until 150).map(i =>
      genRun.apply(Gen.Parameters.default, Seed(2000L + i)).getOrElse("123"))
    val docs = runs.zipWithIndex
      .map { case (r, i) => (i.toLong, s"pay $r now") }.toDF("doc_id", "text")
    val res = graft.ops.Redact.luhnScreen(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    runs.zipWithIndex.foreach { case (r, i) =>
      val isCand = r.length >= 13 && r.length <= 19
      val expect = (if (isCand) 1L else 0L,
        if (isCand && luhnRef(r)) 1L else 0L)
      assert(res(i.toLong) == expect, s"run $r (len ${r.length})")
    }
  }

  test("turnStats alternation/role verdicts match a driver-side reference") {
    import spark.implicits._
    val genRole = Gen.frequency(4 -> Gen.const("user"),
      4 -> Gen.const("assistant"), 1 -> Gen.const("system"),
      1 -> Gen.const("narrator")) // unknown role exercises roles_ok
    val genConv = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genRole))
    val convs = (0 until 150).map { i =>
      val roles = genConv.apply(Gen.Parameters.default, Seed(3000L + i))
        .getOrElse(List("user"))
      (i.toLong, roles, roles.map(r => s"$r: word one two").mkString(" ||| "))
    }
    val df = convs.map(c => (c._1, c._3)).toDF("doc_id", "conv")
    val res = graft.ops.Dialog.turnStats(df, "doc_id", "conv")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_turns"), r.getAs[Boolean]("roles_ok"),
          r.getAs[Boolean]("alternation_ok"), r.getAs[Long]("user_tok"),
          r.getAs[Long]("asst_tok"))).toMap
    val known = Set("user", "assistant", "system")
    convs.foreach { case (id, roles, _) =>
      val expect = (roles.length.toLong,
        roles.forall(known),
        roles.length < 2 || roles.sliding(2).forall(p => p.head != p(1)),
        3L * roles.count(_ == "user"),
        3L * roles.count(_ == "assistant"))
      assert(res(id) == expect, s"doc $id roles $roles")
    }
  }
}
