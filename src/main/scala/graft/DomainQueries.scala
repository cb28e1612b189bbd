package graft

import org.apache.spark.sql.functions._

/** Round-11 batch (q189+): PSL-backed registrable-domain (eTLD+1)
  * curation — the ownership-boundary upgrade of the q152/q153/q161
  * host family (a naive 2-label tail treats `a.co.uk` and `b.co.uk`
  * as one registrant and makes a `co.uk` blocklist entry
  * expressible) — and script-aware tokenization for no-space scripts
  * (CJK/Thai), where the space tokenizer has zero near-dup recall.
  *
  * Oracle discipline: the PSL rule sets interpolate into the DuckDB
  * SQL from the SAME frozen Scala Seqs the engine evaluates
  * ([[graft.ops.Web.Psl.Icann]]), so engine and oracle cannot drift;
  * every sampling decision stays on the md5-slot integer recipe.
  */
object DomainQueries {
  import Tables._

  private def hash32Sql(e: String): String =
    s"""list_reduce([strpos('0123456789abcdef', substr(md5($e), hx, 1)) - 1 for hx in range(1, 9)],
                    (a, b) -> a*16 + b)"""

  private val HostSql =
    s"lower(regexp_extract(url, '${graft.ops.Web.HostRegex}', 1))"

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString(", ")

  // The PSL walk as SQL over CTE columns `ls` (label list) and `n`
  // (label count) — the exact decision order of Web.pslMatchLen:
  // exception beats wildcard, explicit 3-label beats 2-label/wildcard,
  // the implicit `*` default makes every bare TLD a 1-label suffix.
  private val P = graft.ops.Web.Psl.Icann
  private val PslMatchLenSql = s"""
        CASE WHEN n >= 2 AND array_to_string(ls[n-1:n], '.') IN (${inList(P.exception2)}) THEN 1
             WHEN n >= 3 AND array_to_string(ls[n-2:n], '.') IN (${inList(P.suffix3)}) THEN 3
             WHEN ls[n] IN (${inList(P.wild1)})
                  OR (n >= 2 AND array_to_string(ls[n-1:n], '.') IN (${inList(P.suffix2)})) THEN 2
             ELSE 1 END"""

  // CTE chain host -> (ls, n) -> m -> reg, reusable by every query
  // here; expects a CTE `hh` with (…, h). Emits CTEs `l`, `mm`, `rd`
  // where `rd` carries the input columns plus `reg`.
  private def regDomainCtes(carry: String): String = s"""
        l AS (SELECT $carry, h, string_split(h, '.') AS ls,
                     len(string_split(h, '.')) AS n FROM hh),
        mm AS (SELECT $carry, h, ls, n, $PslMatchLenSql AS m FROM l),
        rd AS (SELECT $carry, h,
                 CASE WHEN h = '' OR n <= m THEN ''
                      ELSE array_to_string(ls[n-m:n], '.') END AS reg
               FROM mm)"""

  // q189 synthetic URLs: eight host shapes exercising every PSL rule
  // class — deep subdomain on a 2-label suffix (co.uk), www on com.au,
  // plain .com, a 3-label suffix (act.edu.au), a whole-TLD wildcard
  // (*.ck), the wildcard EXCEPTION (!www.ck), a host that IS a public
  // suffix (no registrable domain), and an unparseable URL. doc_id %
  // 5 varies the registrant label so grouping stays non-trivial.
  private val RegUrlSynthSql = """
        (CASE doc_id % 8
          WHEN 0 THEN 'https://a.b.site' || CAST(doc_id % 5 AS STRING) || '.co.uk/p'
          WHEN 1 THEN 'https://www.site' || CAST(doc_id % 5 AS STRING) || '.com.au/p'
          WHEN 2 THEN 'https://blog.site' || CAST(doc_id % 5 AS STRING) || '.com/p'
          WHEN 3 THEN 'https://deep.school' || CAST(doc_id % 5 AS STRING) || '.act.edu.au/p'
          WHEN 4 THEN 'https://foo.bar' || CAST(doc_id % 5 AS STRING) || '.ck/p'
          WHEN 5 THEN 'https://www.ck/p'
          WHEN 6 THEN 'https://co.uk/p'
          ELSE 'not a url ' || CAST(doc_id AS STRING)
         END)"""

  // q190 synthetic URLs: three subdomains (www/blog/shop) of each of
  // five co.uk registrants — one OWNERSHIP bucket spanning three
  // hosts, which a host-keyed cap would treat as three separate
  // allowances and a naive 2-label key would fuse across registrants.
  private val CapUrlSynthSql = """
        'https://' ||
        (CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' ELSE 'shop.' END) ||
        'site' || CAST(doc_id % 5 AS STRING) || '.co.uk/docs/' ||
        CAST(doc_id AS STRING)"""

  private def hash60Sql(e: String): String =
    s"""list_reduce([strpos('0123456789abcdef', substr(md5($e), hx, 1)) - 1 for hx in range(1, 16)],
                    (a, b) -> a*16 + b)"""

  // Oracle mirror of Pipeline.wordsAuto: char bigrams when the
  // majority of non-space chars are no-space-script codepoints, space
  // tokens otherwise. regexp_replace carries the 'g' flag (DuckDB
  // replaces first-only by default; Spark replaces all). The
  // comprehension variable is `bx`, not `i` (the q182 scoping trap).
  private def wordsAutoSql(text: String): String = {
    val stripped = s"regexp_replace($text, ' ', '', 'g')"
    val ns =
      s"length(regexp_replace($text, '${Pipeline.NotNoSpaceScriptClass}', '', 'g'))"
    s"""(CASE WHEN $ns * 2 > length($stripped)
          THEN (CASE WHEN length($stripped) <= 1 THEN [$stripped]
                     ELSE [substr($stripped, bx, 2)
                           for bx in range(1, length($stripped))] END)
          ELSE string_split($text, ' ') END)"""
  }

  // q192 synthetic corpus over doc_id < 24: two CJK near-dup families
  // (a Chinese and a Japanese base, each with three tail variants — a
  // space tokenizer sees each as ONE token and finds nothing), an
  // English near-dup family as the dispatch control (must route
  // through SPACE tokens), and per-doc noise rows that must pair with
  // nothing. Perturbation picks by doc_id % 12 range (no integer
  // division — `//` vs `div` differs between the engines).
  private val CjkBaseA =
    "春眠不觉晓处处闻啼鸟夜来风雨声花落知多少床前明月光疑是地上霜举头望明月低头思故乡"
  private val CjkBaseB =
    "吾輩は猫である名前はまだ無いどこで生れたかとんと見当がつかぬ何でも薄暗いじめじめした所で泣いていた事だけは記憶している"
  private val EngBase =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"
  private val CjkSynthSql = s"""
        (CASE doc_id % 4
          WHEN 0 THEN '$CjkBaseA' ||
            (CASE WHEN doc_id % 12 < 4 THEN ''
                  WHEN doc_id % 12 < 8 THEN '完' ELSE '终了' END)
          WHEN 1 THEN '$CjkBaseB' ||
            (CASE WHEN doc_id % 12 < 4 THEN ''
                  WHEN doc_id % 12 < 8 THEN '完' ELSE '终了' END)
          WHEN 2 THEN '$EngBase' ||
            (CASE WHEN doc_id % 12 < 4 THEN ''
                  WHEN doc_id % 12 < 8 THEN ' indeed' ELSE ' very truly' END)
          ELSE 'noise' || CAST(doc_id AS STRING) ||
               ' filler' || CAST(doc_id AS STRING) ||
               ' tail' || CAST(doc_id AS STRING) ||
               ' end' || CAST(doc_id AS STRING)
         END)"""

  val all: Seq[QueryDef] = Seq(

    // Registrable-domain extraction ([[ops.Web.registrableDomain]]):
    // the PSL walk (frozen ICANN snapshot) as pure scan-side
    // expressions — exceptions beat wildcards, 3-label rules beat
    // 2-label, every bare TLD is an implicit suffix, and a host that
    // IS a public suffix (or junk) yields '' rather than erroring.
    // The oracle replays the identical walk from the same rule Seqs.
    QueryDef("q189_registrable_domain",
      Some(s"""
        WITH u AS (SELECT doc_id, $RegUrlSynthSql AS url FROM documents),
        hh AS (SELECT doc_id, $HostSql AS h FROM u),
        ${regDomainCtes("doc_id")}
        SELECT doc_id, h AS host, reg AS reg_domain
        FROM rd ORDER BY doc_id"""),
      (s, d) => spread(documents(s, d))
        .withColumn("url", expr(RegUrlSynthSql))
        .select(col("doc_id"),
          graft.ops.Web.host(col("url")).as("host"),
          graft.ops.Web.registrableDomain(col("url")).as("reg_domain"))
        .orderBy("doc_id")),

    // Registrable-domain cap ([[ops.Web.hostCapSample]] with
    // byRegistrable): the q153 downweighting rule keyed on the
    // OWNERSHIP boundary — www/blog/shop subdomains of one co.uk
    // registrant share a single allowance (a host-keyed cap would
    // give each subdomain its own; a naive 2-label key would pool
    // every registrant under co.uk into one bucket). Counts, integer
    // keep_ppm, and md5 slots replay exactly.
    QueryDef("q190_registrable_cap",
      Some(s"""
        WITH u AS (SELECT doc_id, $CapUrlSynthSql AS url FROM documents),
        hh AS (SELECT doc_id, $HostSql AS h FROM u),
        ${regDomainCtes("doc_id")},
        k AS (SELECT reg, least(1000000, (20 * 1000000) // COUNT(*)) AS keep_ppm
              FROM rd GROUP BY reg)
        SELECT rd.doc_id, rd.reg AS host, CAST(k.keep_ppm AS BIGINT) AS keep_ppm
        FROM rd JOIN k USING (reg)
        WHERE ${hash32Sql("CAST(rd.doc_id AS VARCHAR)")} % 1000000 < k.keep_ppm
        ORDER BY rd.doc_id"""),
      (s, d) => graft.ops.Web.hostCapSample(
          spread(documents(s, d)).withColumn("url", expr(CapUrlSynthSql)),
          "doc_id", "url", maxDocsPerHost = 20, byRegistrable = true)
        .select(col("doc_id"), col("host"), col("keep_ppm"))
        .orderBy("doc_id")),

    // Registrable-only blocklist ([[ops.Web.blocklistFilter]] with
    // registrableOnly): suffix matching stops AT the registrable
    // domain, so `site1.co.uk` blocks every one of its subdomains
    // while a blocklist entry naming the bare public suffix `co.uk`
    // matches nothing (with q161's naive suffixes it would block the
    // entire registry). Survivors replay as an anti-join over the
    // suffix window [registrable, host].
    QueryDef("q191_registrable_blocklist",
      Some(s"""
        WITH u AS (SELECT doc_id, $CapUrlSynthSql AS url FROM documents),
        hh AS (SELECT doc_id, $HostSql AS h FROM u),
        ${regDomainCtes("doc_id")},
        sf AS (SELECT mm.doc_id, mm.h,
                 [array_to_string(mm.ls[sx:mm.n], '.')
                  for sx in range(1, greatest(mm.n - mm.m, 1) + 1)] AS sufs
               FROM mm)
        SELECT doc_id, h AS host FROM sf
        WHERE len(list_filter(sufs,
                s -> s IN ('site1.co.uk', 'co.uk'))) = 0
        ORDER BY doc_id"""),
      (s, d) => {
        import s.implicits._
        val blocklist = Seq("site1.co.uk", "co.uk").toDF("domain")
        graft.ops.Web.blocklistFilter(
            spread(documents(s, d)).withColumn("url", expr(CapUrlSynthSql)),
            "doc_id", "url", blocklist, registrableOnly = true)
          .select(col("doc_id"),
            graft.ops.Web.host(col("url")).as("host"))
          .orderBy("doc_id")
      }),

    // Script-aware near-dup ([[Pipeline.wordsAuto]] feeding the full
    // q138 chain — shingles, MinHash, threshold-derived LSH bands,
    // hashed verify): CJK documents tokenize as char bigrams, so the
    // two planted CJK families PAIR (with the space tokenizer their
    // recall is exactly zero — each doc is one token and the shingle
    // gate drops it), while the English control family routes through
    // space tokens unchanged and noise rows pair with nothing. The
    // oracle replays the dispatch, the bigram surrogate, and the
    // entire LSH chain.
    QueryDef("q192_cjk_neardup",
      Some(s"""
        WITH corpus AS (SELECT doc_id, $CjkSynthSql AS text
                        FROM documents WHERE doc_id < 24),
        t AS (SELECT doc_id, ${wordsAutoSql("text")} AS w FROM corpus),
        sh AS (SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ')
                                for i in range(1, len(w)-1)]) AS shingles
               FROM t WHERE len(w) >= 3),
        ${PipelineQueries.minhashSigCte("doc_id", PipelineQueries.lshK05)}
        ${PipelineQueries.bandedCandCte(PipelineQueries.lshBands05,
          PipelineQueries.lshRows05)},
        h AS (SELECT doc_id, list_transform(shingles, s -> ${hash60Sql("s")}) AS hs FROM sh),
        v AS (SELECT c.a_id, c.b_id,
                CAST(len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS BIGINT) AS i,
                CAST(len(a.hs) + len(b.hs)
                     - len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS BIGINT) AS u
              FROM cand c
              JOIN h a ON a.doc_id = c.a_id
              JOIN h b ON b.doc_id = c.b_id)
        SELECT a_id, b_id, (1000000 * i) // u AS jaccard_ppm
        FROM v WHERE i * 1000000 >= u * 500000
        ORDER BY a_id, b_id"""),
      (s, d) => {
        val corpus = spread(documents(s, d)).filter(col("doc_id") < 24)
          .select(col("doc_id"), expr(CjkSynthSql).as("text"))
        val sig = Dedup.shingleSignatures(corpus, "doc_id", "text",
            tokenizer = Pipeline.wordsAuto)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Dedup.verifiedPairsHashed(sig, "doc_id", threshold = 0.5,
            maxBucketSize = Int.MaxValue)
          .orderBy("a_id", "b_id")
      }),

    // Script-aware TOKEN-BUDGET mixing ([[Pipeline.tokenCountAuto]]
    // feeding [[ops.Sampling.targetMixTokens]]): the q188 machinery
    // over a bilingual corpus where the zh documents carry REAL CJK
    // text — with `size(split(text, ' '))` each would count as ONE
    // token and a "40% zh by tokens" budget would allocate zh nearly
    // nothing; the bigram surrogate charges them their character
    // mass. The oracle replays the dispatch, the surrogate counts,
    // totals, feasible volume, quotas, slot order, and token window.
    QueryDef("q193_cjk_token_budget",
      Some(s"""
        WITH tg AS (SELECT * FROM (VALUES ('en', 600000), ('zh', 400000)) AS v(lang, ppm)),
        c AS (SELECT doc_id, lang,
                (CASE WHEN lang = 'zh'
                      THEN substr(repeat('$CjkBaseA', 20), 1,
                                  (CAST(n_chars AS INTEGER) % 200) + 30)
                      ELSE text END) AS t
              FROM documents WHERE lang IN ('en', 'zh')),
        tok AS (SELECT doc_id, lang,
                  CAST(len(${wordsAutoSql("t")}) AS BIGINT) AS n_tok
                FROM c),
        tt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS ts
               FROM tok GROUP BY lang),
        t AS (SELECT MIN((COALESCE(tt.ts, 0) * 1000000) // tg.ppm) AS t
              FROM tg LEFT JOIN tt USING (lang)),
        q AS (SELECT tg.lang, (t.t * tg.ppm) // 1000000 AS quota
              FROM tg CROSS JOIN t),
        r AS (SELECT doc_id, lang, n_tok,
                CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang
                  ORDER BY ${hash32Sql("CAST(doc_id AS VARCHAR)")} % 1000000, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS tb
              FROM tok)
        SELECT r.doc_id, r.lang, r.n_tok, r.tb AS tok_before
        FROM r JOIN q ON r.lang = q.lang AND r.tb < q.quota
        ORDER BY r.doc_id"""),
      (s, d) => {
        val c = spread(documents(s, d))
          .filter(col("lang").isin("en", "zh"))
          .select(col("doc_id"), col("lang"),
            when(col("lang") === "zh",
              substr(repeat(lit(CjkBaseA), 20), lit(1),
                pmod(col("n_chars").cast("int"), lit(200)) + 30))
              .otherwise(col("text")).as("t"))
        graft.ops.Sampling.targetMixTokens(
            c.select(col("doc_id"), col("lang"),
              Pipeline.tokenCountAuto(col("t")).as("n_tok")),
            "doc_id", "lang", "n_tok",
            Seq(("en", 600000), ("zh", 400000)))
          .select("doc_id", "lang", "n_tok", "tok_before")
          .orderBy("doc_id")
      })
  )
}
