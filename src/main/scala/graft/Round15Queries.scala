package graft

import org.apache.spark.sql.functions._

/** Round-15 batch (q264+): the two set-text dedup modalities the
  * round-14 verdict named as the remaining first-class gaps — exact
  * SUBSTRING-level span dedup (ExactSubstr, Lee et al. 2022: flag the
  * maximal duplicated token spans so curation cuts the span, not the
  * document) and the WEIGHTED set-similarity join (tf-idf weighted
  * Jaccard through the same three lossless PPJoin filters — the form
  * retrieval pipelines actually run).
  *
  * House discipline: integer-exact thresholds (ppm weights, integer
  * fractions), md5-derived 60-bit keys both engines replay, planted
  * witnesses beyond the corpus id range, ORDER BY on every output.
  */
object Round15Queries {
  import Tables._

  // Oracle mirror of Pipeline.wordHash60 (first 15 md5 hex digits) —
  // the integer join-key narrowing recipe (q140/q251's key).
  private def hash60Sql(e: String): String =
    s"""list_reduce([strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1 for i in range(1, 16)],
                    (a, b) -> a*16 + b)"""

  /** ExactSubstr span-level dedup ([[ops.SpanDedup.duplicatedSpans]]):
    * maximal token spans covered by a corpus-duplicated 8-token
    * window, merged per document. Two planted docs share a 12-token
    * run embedded at DIFFERENT offsets in different surroundings —
    * document-level dedup scores them low (4/16 words differ plus
    * order), span-level flags exactly the copied run: [3,15) and
    * [4,16). The oracle replays window hashes, corpus-wide counts,
    * and the gaps-and-islands merge verbatim.
    */
  private lazy val q264: QueryDef =
    QueryDef("q264_exact_substr_spans",
      Some(s"""
        WITH corpus AS (SELECT doc_id, text FROM documents
                UNION ALL SELECT 9100001, 'a0 a1 d0 d1 d2 d3 d4 d5 d6 d7 d8 d9 da db a2 a3'
                UNION ALL SELECT 9100002, 'b0 b1 b2 d0 d1 d2 d3 d4 d5 d6 d7 d8 d9 da db b3'),
        wl AS (SELECT doc_id AS id, string_split(text, ' ') AS l FROM corpus),
        pp AS (SELECT id, l, unnest(range(1, len(l) - 6)) AS pos
               FROM wl WHERE len(l) >= 8),
        an AS (SELECT id, pos,
                 ${hash60Sql("array_to_string(l[pos:pos+7], ' ')")} AS h
               FROM pp),
        oc AS (SELECT h, COUNT(*) AS occ FROM an GROUP BY h),
        du AS (SELECT id, pos FROM an JOIN oc USING (h) WHERE occ >= 2),
        fl AS (SELECT id, pos,
                 CASE WHEN pos <= MAX(pos + 8) OVER (PARTITION BY id
                   ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) THEN 0 ELSE 1 END AS f
               FROM du),
        il AS (SELECT id, pos,
                 SUM(f) OVER (PARTITION BY id ORDER BY pos) AS island
               FROM fl)
        SELECT id AS doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 8 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_tokens
        FROM il GROUP BY id, island
        ORDER BY doc_id, span_start"""),
      (s, d) => {
        import s.implicits._
        val corpus = spread(documents(s, d)).select("doc_id", "text")
          .unionAll(Seq(
            (9100001L, "a0 a1 d0 d1 d2 d3 d4 d5 d6 d7 d8 d9 da db a2 a3"),
            (9100002L, "b0 b1 b2 d0 d1 d2 d3 d4 d5 d6 d7 d8 d9 da db b3"))
            .toDF("doc_id", "text"))
        graft.ops.SpanDedup.duplicatedSpans(corpus, "doc_id", "text", l = 8)
          .orderBy("doc_id", "span_start")
      })

  /** Weighted set-similarity join ([[ops.SetSim
    * .weightedPrefixFilterJoin]]): idf-weighted Jaccard >= 4/5 over
    * bigram-shingle tokens, weights `greatest(1e6 div df, 1)` ppm —
    * rare shared shingles dominate, ambient vocabulary fades, which
    * is why retrieval dedup weights its tokens. The oracle is the
    * BRUTE-FORCE posting join (every pair sharing >= 1 token, exact
    * weighted intersection/union) — a stronger check than replaying
    * the filters: the engine's prefix + length + positional pruning
    * must reproduce the unfiltered answer exactly. The q251 planted
    * near-dups score 9/11 weighted (0.818) and witness the output.
    */
  private lazy val q265: QueryDef =
    QueryDef("q265_weighted_setsim_join",
      Some(s"""
        WITH corpus AS (SELECT doc_id, text FROM documents
                UNION ALL SELECT 9000001, 'p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 pa pb pc pd pe pf pg ph pi z0'
                UNION ALL SELECT 9000002, 'p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 pa pb pc pd pe pf pg ph pi z1'),
        wl AS (SELECT doc_id AS id, string_split(text, ' ') AS l FROM corpus),
        tk AS (SELECT id,
                 unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS sh
               FROM wl WHERE len(l) >= 2),
        tok AS (SELECT DISTINCT id, ${hash60Sql("sh")} AS tok FROM tk),
        dfx AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok),
        w AS (SELECT tok, GREATEST(1000000 // df, 1) AS wt FROM dfx),
        tw AS (SELECT id, SUM(wt) AS tw FROM tok JOIN w USING (tok)
               GROUP BY id),
        pi AS (SELECT a.id AS a_id, b.id AS b_id, SUM(w.wt) AS w_inter
               FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
               JOIN w ON w.tok = a.tok
               GROUP BY 1, 2),
        j AS (SELECT a_id, b_id, w_inter,
                ta.tw + tb.tw - w_inter AS w_union
              FROM pi JOIN tw ta ON ta.id = a_id
                      JOIN tw tb ON tb.id = b_id)
        SELECT a_id, b_id, CAST(w_inter AS BIGINT) AS w_inter,
               CAST(w_union AS BIGINT) AS w_union,
               CAST(w_inter * 1000000 // w_union AS BIGINT) AS wjaccard_ppm
        FROM j WHERE w_inter * 5 >= w_union * 4
        ORDER BY a_id, b_id"""),
      (s, d) => {
        import s.implicits._
        val corpus = spread(documents(s, d)).select("doc_id", "text")
          .unionAll(Seq(
            (9000001L, "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 pa pb pc pd pe pf pg ph pi z0"),
            (9000002L, "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 pa pb pc pd pe pf pg ph pi z1"))
            .toDF("doc_id", "text"))
        // distinct bigram shingles as 60-bit keys (wordShingles
        // already distincts per doc, so df below is doc frequency)
        val toks = corpus
          .select(col("doc_id"),
            explode(graft.Pipeline.wordShingles(
              split(col("text"), " "), 2)).as("_sh"))
          .select(col("doc_id"),
            graft.Pipeline.wordHash60(col("_sh")).as("tok"))
        val w = toks.groupBy("tok").agg(count(lit(1)).as("df"))
          .select(col("tok"),
            greatest(expr("1000000L div df"), lit(1L)).as("wt"))
        graft.ops.SetSim.weightedPrefixFilterJoin(
            toks.join(w, "tok"), "doc_id", "tok", "wt", tNum = 4, tDen = 5)
          .orderBy("a_id", "b_id")
      })

  val all: Seq[QueryDef] = Seq(q264, q265)
}
