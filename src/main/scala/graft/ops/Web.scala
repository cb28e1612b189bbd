package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline.words

/** Host/domain-level curation: real crawls key their quality and
  * mixing decisions on the DOMAIN (per-host caps, per-host quality
  * priors, domain blocklists), so the host is the fundamental grouping
  * key of a web-scale corpus.
  *
  * Host extraction is a plain `regexp_extract` — deliberately NOT
  * `parse_url` (a Spark-side builtin whose URL-parsing corner cases no
  * other engine replays); one regex, identical semantics on every
  * RE2/Java-regex engine, so the DuckDB oracle replays it verbatim.
  *
  * Scale shapes: host extraction is scan-side (zero shuffle); the
  * stats and cap operators shuffle once on the host key — hosts are
  * high-cardinality (millions on a real crawl), so the aggregates
  * spread evenly and are map-side combined. Nothing here holds more
  * than one aggregate row per host.
  */
object Web {

  /** Host part of a URL: `scheme://[userinfo@]HOST[:port][/path...]`.
    * Group 1 stops at '/', '?', '#', or ':' (port); an optional
    * userinfo ('user:pw@') is skipped non-greedily. Unparseable URLs
    * extract as '' (both engines return the empty string on no match)
    * and flow through as their own "host" rather than erroring — a
    * crawl always carries junk URLs, and dropping them silently would
    * misreport corpus volume.
    */
  val HostRegex: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

  /** Lower-cased host column (hostnames are case-insensitive). */
  def host(url: Column): Column = lower(regexp_extract(url, HostRegex, 1))

  /** Per-host corpus footprint: `(host, n_docs, n_tokens)` — the frame
    * every per-host policy (caps, priors, blocklists) starts from. One
    * host-keyed aggregate; token counts are scan-side array sizes
    * (the tokens themselves never materialize).
    */
  def hostStats(docs: DataFrame, urlCol: String, textCol: String,
                byRegistrable: Boolean = false): DataFrame = {
    val key = if (byRegistrable) registrableDomain(col(urlCol))
              else host(col(urlCol))
    docs
      .select(key.as("host"),
        size(words(col(textCol))).cast(LongType).as("_t"))
      .groupBy(col("host"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("_t")).cast(LongType).as("n_tokens"))
  }

  /** Per-host cap DOWNWEIGHTING: keep each doc with probability
    * `min(1, maxDocsPerHost / n_docs(host))` via the deterministic
    * md5-slot filter — hosts under the cap keep everything, a host
    * 100x over it keeps a ~1/100 uniform sample, so no host dominates
    * the mix while within-host diversity survives (the standard
    * web-corpus downweighting rule; use [[Sampling.prioritySample]]
    * keyed on the host instead when the cap must be EXACT per host).
    *
    * The keep threshold is the integer ppm `least(1e6, (cap * 1e6)
    * div n_docs)` compared against `hash32(md5(id)) % 1e6` — the
    * [[Sampling.weighted]] slot discipline with an INTEGER threshold:
    * a double weight would round-trip through `floor(w * 1e6)` and
    * can land one slot off across engines (x/1e6*1e6 is not exact in
    * binary floating point); the integer div replays bit-identically.
    *
    * Output: the surviving docs plus `host` and `keep_ppm` (the
    * audit columns a mix report wants). One host-keyed count + one
    * host-keyed join + a scan-side filter.
    */
  def hostCapSample(docs: DataFrame, idCol: String, urlCol: String,
                    maxDocsPerHost: Long,
                    byRegistrable: Boolean = false): DataFrame = {
    require(maxDocsPerHost >= 1,
      s"maxDocsPerHost must be >= 1, got $maxDocsPerHost")
    // byRegistrable: the cap buckets on the OWNERSHIP boundary —
    // `blog.example.co.uk` and `shop.example.co.uk` share one
    // allowance, while `a.co.uk` and `b.co.uk` (different
    // registrants) do not
    val key = if (byRegistrable) registrableDomain(col(urlCol))
              else host(col(urlCol))
    val withHost = docs.withColumn("host", key)
    val caps = withHost.groupBy(col("host"))
      .agg(count(lit(1)).cast(LongType).as("_n"))
      .select(col("host"),
        least(lit(1000000L), expr(s"(${maxDocsPerHost}L * 1000000L) div _n"))
          .as("keep_ppm"))
    withHost.join(caps, "host")
      .filter(
        pmod(graft.Pipeline.wordHash32(col(idCol).cast("string")),
          lit(1000000L)) < col("keep_ppm"))
  }

  /** Canonical form of a URL — the dedup key for URL-level dedup (the
    * cheapest dedup tier on a crawl: the same page fetched under
    * cosmetic URL variants collapses before any text is compared).
    * Rules, each a pure scan-side expression:
    *   - scheme and host lower-cased (case-insensitive per RFC 3986);
    *   - userinfo dropped (never identifies a distinct resource);
    *   - a leading `www.` stripped from the host;
    *   - the default port for the (canonical) scheme dropped
    *     (`http:80`, `https:443`); other ports kept;
    *   - the fragment dropped (client-side only);
    *   - one trailing `/` stripped (path case is preserved — unlike
    *     hosts, paths ARE case-sensitive).
    * URLs that don't parse (no `scheme://`) canonicalize to the empty
    * string and group together — junk stays visible, never errors.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val h = regexp_replace(host(url), "^www\\.", "")
    val port = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    // path + query, fragment off, one trailing slash off
    val rest = regexp_replace(regexp_replace(
      regexp_extract(url,
        "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]*(.*)$", 1),
      "#.*$", ""), "/$", "")
    when(scheme === "", lit(""))
      .otherwise(concat(scheme, lit("://"), h, portPart, rest))
  }

  /** STRONG canonical form: [[canonicalUrl]] plus query-string
    * normalization — tracking parameters dropped (`utm_*`, `gclid`,
    * `fbclid`, `msclkid`, `ref`, the analytics decorations that mint
    * unlimited aliases of one resource) and the SURVIVING parameters
    * sorted (param order is almost never semantic; sorting collapses
    * `?a=1&b=2` with `?b=2&a=1`). An empty survivor set drops the
    * `?` entirely. The aggressive dedup key for crawl frontiers —
    * opt-in because a rare site DOES key content on param order or a
    * `ref` param; [[canonicalUrl]] stays the conservative default.
    * Pure scan-side HOFs over the split query string.
    */
  def canonicalUrlStrong(url: Column): Column = {
    val base = canonicalUrl(url)
    val path = regexp_extract(base, "^([^?]*)", 1)
    val query = regexp_extract(base, "^[^?]*\\?(.*)$", 1)
    // (?i) + optional '=': valueless tracking params ('?gclid') and
    // uppercase keys ('UTM_Source=x') must not survive the dedup key
    val kept = array_join(sort_array(filter(split(query, "&"),
      p => !p.rlike(TrackingParamRegex))), "&")
    when(query === "" || kept === "", path)
      .otherwise(concat(path, lit("?"), kept))
  }

  /** Tracking-param match for [[canonicalUrlStrong]] — case-insensitive,
    * `=` optional (a bare `?gclid` is still a tracking decoration).
    * Shared with the oracle mirror so engine and replay cannot drift.
    */
  val TrackingParamRegex: String =
    "(?i)^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)(=|$)"

  /** URL-level dedup groups: one row per canonical URL with the kept
    * doc (lowest id — deterministic) and the variant count. One
    * canonical-key aggregate; join the result back on `keep_id` to
    * materialize the surviving docs.
    */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(canonicalUrl(col(urlCol)).as("canon_url"), col(idCol))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).cast(LongType).as("n_variants"))

  /** Every dot-suffix of the host down to the registrable-ish 2-label
    * tail: `a.b.example.com` -> [a.b.example.com, b.example.com,
    * example.com]. The match domain for suffix blocklists; a naive
    * eTLD boundary (public-suffix-list multi-label TLDs like `co.uk`
    * match one level too deep — use [[registrableSuffixes]] where the
    * boundary matters).
    */
  def hostSuffixes(url: Column): Column = {
    val labels = split(host(url), "\\.")
    transform(sequence(lit(1), greatest(size(labels) - 1, lit(1))),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Public-suffix rule set for [[registrableDomain]] — the rule
    * shapes of the PSL algorithm (publicsuffix.org/list/): explicit
    * 2-/3-/4-label suffixes, wildcards (`*.ck` — ANY single label
    * under the parent is a public suffix; `*.kawasaki.jp` the 2-label
    * parent form), and wildcard exceptions (`!www.ck`,
    * `!city.kawasaki.jp` — registrable despite the wildcard). Every
    * 1-label TLD is implicitly a public suffix (the PSL's default `*`
    * rule), so it never needs listing. These seven Seqs cover every
    * shape in the published list's current ICANN section (plain rules
    * top out at 4 labels — the US `pvt.k12.<state>.us` family;
    * wildcards at 2-label parents — the JP city registries).
    * [[Psl.Icann]] is the frozen default; [[PslRules.fromFile]] loads
    * a full published `public_suffix_list.dat` when the corpus needs
    * complete coverage — the ALGORITHM is total, only the snapshot is
    * a subset.
    */
  final case class PslRules(suffix2: Seq[String], suffix3: Seq[String],
                            wild1: Seq[String], exception2: Seq[String],
                            suffix4: Seq[String] = Nil,
                            wild2: Seq[String] = Nil,
                            exception3: Seq[String] = Nil)

  object PslRules {
    /** Parse a published `public_suffix_list.dat` (the live format:
      * `//` comments, blank lines, one rule per line, optional
      * ICANN/PRIVATE section markers) into the rule Seqs the frozen
      * snapshot hand-encodes. `icannOnly` (default) keeps only the
      * `===BEGIN ICANN DOMAINS===` section when markers are present —
      * the PRIVATE section's registry-like entries (github.io,
      * `*.compute.amazonaws.com`) answer a different question than
      * crawl ownership grouping, and carry shapes (deep wildcards)
      * outside the engine's ladder. 1-label plain rules are dropped
      * (the implicit default `*` rule already makes every bare TLD a
      * public suffix); anything deeper than the supported shapes
      * raises rather than silently degrading the boundary.
      */
    def fromFile(path: String, icannOnly: Boolean = true): PslRules =
      fromLines(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path)).split("\n").toSeq, icannOnly)

    def fromLines(lines: Seq[String], icannOnly: Boolean = true): PslRules = {
      val begin = "// ===BEGIN ICANN DOMAINS==="
      val end = "// ===END ICANN DOMAINS==="
      val trimmed = lines.map(_.trim)
      val scoped =
        if (icannOnly && trimmed.contains(begin))
          trimmed.dropWhile(_ != begin).takeWhile(_ != end)
        else trimmed
      // a rule is the line's first whitespace-delimited token (the
      // published format allows trailing commentary on a line)
      val rules = scoped
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map(_.split("\\s+")(0).toLowerCase)
      import scala.collection.mutable.ArrayBuffer
      val s2, s3, s4, w1, w2, e2, e3, bad = ArrayBuffer.empty[String]
      rules.foreach { r =>
        // a malformed rule (empty label: leading/trailing/double dot)
        // must not silently become a different-depth rule
        if (r.split("\\.", -1).exists(_.isEmpty)) bad += r
        else if (r.startsWith("!")) r.drop(1).split("\\.").length match {
          case 2 => e2 += r.drop(1)
          case 3 => e3 += r.drop(1)
          case _ => bad += r
        }
        else if (r.startsWith("*.")) {
          val parent = r.drop(2)
          if (parent.contains("*")) bad += r
          else parent.split("\\.").length match {
            case 1 => w1 += parent
            case 2 => w2 += parent
            case _ => bad += r
          }
        }
        else if (r == "*") () // the implicit default rule, always on
        else if (r.contains("*")) bad += r // interior wildcards unsupported
        else r.split("\\.").length match {
          case 1 => () // implicit default already covers bare TLDs
          case 2 => s2 += r
          case 3 => s3 += r
          case 4 => s4 += r
          case _ => bad += r
        }
      }
      require(bad.isEmpty,
        s"unsupported PSL rule shapes (beyond 4-label suffix / 2-label " +
          s"wildcard parent / 3-label exception): ${bad.take(10).mkString(", ")}")
      PslRules(s2.distinct.toSeq, s3.distinct.toSeq, w1.distinct.toSeq,
        e2.distinct.toSeq, s4.distinct.toSeq, w2.distinct.toSeq,
        e3.distinct.toSeq)
    }
  }

  /** Frozen snapshot (subset) of the ICANN section of the public
    * suffix list: the high-traffic multi-label ccTLD registries
    * (uk/au/nz/jp/br/cn/in/za/kr/id/mx/ar/tr/tw/hk/sg/my/th/ph/vn/ua/
    * pl/il/eg/sa/ae/ng/ke/co/pe/ve/uy and the US state space), the
    * Australian state education 3-label branch, and the whole-TLD
    * wildcards with their `www.ck` exception. A snapshot by necessity
    * — the live list churns — and a subset by choice: entries here are
    * the ones a web crawl's host mass actually concentrates on.
    */
  object Psl {
    private val UsStates =
      ("al ak az ar ca co ct de fl ga hi id il in ia ks ky la me md " +
        "ma mi mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc " +
        "sd tn tx ut vt va wa wv wi wy dc").split(" ").toSeq

    val Icann: PslRules = PslRules(
      suffix2 =
        Seq("co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
          "sch.uk", "ac.uk", "gov.uk", "nhs.uk", "police.uk",
          "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
          "id.au",
          "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
          "gen.nz", "geek.nz", "maori.nz", "iwi.nz",
          "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
          "gr.jp", "lg.jp",
          "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
          "art.br", "adv.br", "eco.br", "blog.br",
          "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
          "mil.cn",
          "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
          "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
          "co.za", "org.za", "net.za", "gov.za", "ac.za", "edu.za",
          "web.za", "mil.za",
          "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr",
          "mil.kr", "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr",
          "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
          "mil.id", "net.id", "my.id", "biz.id",
          "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
          "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
          "mil.ar", "tur.ar",
          "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
          "k12.tr", "av.tr", "dr.tr", "bel.tr", "pol.tr", "web.tr",
          "gen.tr",
          "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw",
          "idv.tw", "game.tw", "ebiz.tw", "club.tw",
          "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
          "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
          "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
          "name.my",
          "co.th", "net.th", "org.th", "ac.th", "go.th", "in.th",
          "mi.th", "or.th",
          "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
          "ngo.ph", "i.ph",
          "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
          "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn",
          "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
          "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
          "biz.pl", "waw.pl",
          "co.il", "org.il", "net.il", "ac.il", "gov.il", "k12.il",
          "muni.il", "idf.il",
          "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
          "mil.eg", "eun.eg", "name.eg",
          "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
          "pub.sa", "sch.sa",
          "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae",
          "sch.ae",
          "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
          "mil.ng", "mobi.ng", "name.ng", "sch.ng",
          "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
          "me.ke", "mobi.ke", "info.ke",
          "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
          "mil.co",
          "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
          "nom.pe",
          "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve",
          "mil.ve", "info.ve", "web.ve",
          "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy") ++
          UsStates.map(_ + ".us"),
      suffix3 =
        Seq("act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au",
          "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au"),
      wild1 = Seq("bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg"),
      exception2 = Seq("www.ck"))
  }

  /** Length (in labels) of the host's longest matching public suffix
    * under the PSL algorithm: exceptions beat wildcards, longer
    * explicit rules beat shorter/wildcard rules, and the implicit `*`
    * default makes every bare TLD a 1-label suffix. Pure scan-side
    * arithmetic over the label array; the membership tests compile to
    * `InSet` hash probes inside whole-stage codegen.
    */
  private def pslMatchLen(labels: Column, r: PslRules): Column = {
    val n = size(labels)
    val last1 = array_join(slice(labels, n, lit(1)), ".")
    val suf2 = when(n >= 2, array_join(slice(labels, n - 1, lit(2)), "."))
    val suf3 = when(n >= 3, array_join(slice(labels, n - 2, lit(3)), "."))
    val suf4 = when(n >= 4, array_join(slice(labels, n - 3, lit(4)), "."))
    // an empty rule Seq must test FALSE, not null-propagate
    def inSet(c: Column, s: Seq[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s: _*)
    // PSL precedence: exceptions beat wildcards; otherwise the rule
    // with the MOST labels prevails — the ladder tests longest first
    when(inSet(suf3, r.exception3), lit(2))
      .when(inSet(suf2, r.exception2), lit(1))
      .when(inSet(suf4, r.suffix4), lit(4))
      .when(inSet(suf3, r.suffix3) || inSet(suf2, r.wild2), lit(3))
      .when(inSet(last1, r.wild1) || inSet(suf2, r.suffix2), lit(2))
      .otherwise(lit(1))
  }

  /** REGISTRABLE domain (eTLD+1) of a URL's host: the public suffix
    * plus one label — the boundary at which ownership changes, and
    * therefore the RIGHT grouping key for per-domain caps, blocklists,
    * and authority (the naive 2-label tail puts `a.co.uk` and
    * `b.co.uk` — different registrants — in one bucket, and makes a
    * `co.uk` blocklist entry expressible; reference analog: the
    * hierarchy-prefix containment discipline of init_db.sql:55,81 —
    * the prefix boundary must be the semantic one). A host that IS a
    * public suffix (or doesn't parse) yields `''` — it has no
    * registrant, and junk stays visible in its own group rather than
    * erroring. Pure scan-side expressions.
    */
  def registrableDomain(url: Column,
                        rules: PslRules = Psl.Icann): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val m = pslMatchLen(labels, rules)
    when(h === "" || n <= m, lit(""))
      .otherwise(array_join(slice(labels, n - m, m + lit(1)), "."))
  }

  /** Dot-suffixes of the host down to the REGISTRABLE domain only —
    * the PSL-aware match domain for [[blocklistFilter]]: a bare public
    * suffix (`co.uk`) is never generated, so a blocklist entry for one
    * cannot match anything, while `example.co.uk` still blocks every
    * subdomain. A host that is itself a public suffix (or junk)
    * yields just `[host]` — exact-host blocking stays expressible.
    */
  def registrableSuffixes(url: Column,
                          rules: PslRules = Psl.Icann): Column = {
    val labels = split(host(url), "\\.")
    val n = size(labels)
    val m = pslMatchLen(labels, rules)
    transform(sequence(lit(1), greatest(n - m, lit(1))),
      i => array_join(slice(labels, i, n - i + 1), "."))
  }

  /** Domain-blocklist filter: drop docs whose host — or ANY dot-suffix
    * of it — appears in `blocklist` (a one-column `domain` frame), so
    * one `example.com` entry blocks every subdomain while
    * `tracker.good.org` blocks only that host. The standard crawl
    * hygiene gate (spam/SEO-farm/adult lists key on domains).
    *
    * Shape: suffix explode (bounded by label count, ~3-4x) -> semi-join
    * against the broadcast blocklist -> anti-join the survivors back on
    * the id. Blocklists are small next to a corpus (1e5 rows vs 1e9
    * docs), so the semi-join never shuffles the corpus; the anti-join
    * is id-keyed against the (tiny) blocked-id set, which AQE also
    * broadcasts.
    */
  def blocklistFilter(docs: DataFrame, idCol: String, urlCol: String,
                      blocklist: DataFrame,
                      registrableOnly: Boolean = false): DataFrame = {
    // registrableOnly: match suffixes only down to the registrable
    // domain, so a blocklist entry naming a bare public suffix
    // (`co.uk`) blocks nothing instead of an entire registry
    val sufs = if (registrableOnly) registrableSuffixes(col(urlCol))
               else hostSuffixes(col(urlCol))
    val blockedIds = docs
      .select(col(idCol), explode(sufs).as("_suf"))
      .join(broadcast(blocklist.select(col("domain").as("_suf"))), Seq("_suf"),
        "left_semi")
      .select(col(idCol)).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** Intra-host exact-duplication report: per host, how much of its
    * content is byte-identical repetition — `(host, n_docs, n_dup_docs,
    * dup_ppm)` where `n_dup_docs` counts docs whose md5 content digest
    * appears >= 2 times WITHIN the host. The "template-y host" signal:
    * a host serving the same page under many URLs (session ids, print
    * views, mirrors) shows high `dup_ppm` and is a downweight/
    * cap candidate before any text-level near-dup is paid for.
    *
    * Shape: scan-side digest (docs never shuffle their text — 16-byte
    * digests do), one (host, digest)-keyed count, one host-keyed
    * rollup. Both aggregates are map-side combined; output is one row
    * per host.
    */
  def hostDupStats(docs: DataFrame, urlCol: String,
                   textCol: String): DataFrame =
    docs
      .select(host(col(urlCol)).as("host"),
        md5(col(textCol).cast("binary")).as("_dig"))
      .groupBy(col("host"), col("_dig"))
      .agg(count(lit(1)).cast(LongType).as("_n"))
      .groupBy(col("host"))
      .agg(sum(col("_n")).cast(LongType).as("n_docs"),
        sum(when(col("_n") >= 2, col("_n")).otherwise(0L))
          .cast(LongType).as("n_dup_docs"))
      .withColumn("dup_ppm", expr("(1000000L * n_dup_docs) div n_docs"))

  /** Host × language composition: per (host, lang), the doc count and
    * its share of the host in integer ppm — the mislabeling/mixed-
    * content screen at host granularity (a host whose pages split
    * 60/40 across languages is boilerplate-wrapped, mistranslated, or
    * mislabeled; language-ID audits key on it). One (host, lang)
    * aggregate + a host-partitioned share window over the aggregated
    * frame — bounded per host by the language count, never by docs.
    */
  def hostLangProfile(docs: DataFrame, urlCol: String,
                      langCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
    docs
      .select(host(col(urlCol)).as("host"), col(langCol).as("lang"))
      .groupBy(col("host"), col("lang"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"))
      .withColumn("_host_tot", sum(col("n_docs")).over(w))
      .withColumn("share_ppm", expr("(1000000L * n_docs) div _host_tot"))
      .drop("_host_tot")
  }

  /** Outlink HOST GRAPH from raw HTML: one `(src, dst)` edge per
    * distinct (page-host, linked-host) pair — the input to
    * [[Graph.pageRank]] / [[Graph.hits]] for crawl-derived domain
    * authority (the Common-Crawl-style host ranking that seeds crawl
    * frontiers and source weights).
    *
    * `href` values are lifted with one `regexp_extract_all` over
    * double-quoted anchors; absolute URLs (`scheme://...`) resolve to
    * their own host, everything else (path-relative, query-relative)
    * resolves to the PAGE's host. Self-edges (on-site navigation) and
    * edges with an unparseable end are dropped — the graph is about
    * cross-host endorsement. Scan-side extract + explode, one distinct
    * on the (src, dst) pair.
    */
  /** Shared href-lift pattern for [[outlinkHostEdges]] and
    * [[anchorTexts]]: attributes BEFORE href allowed (`<a class=..
    * href=..>`), single- OR double-quoted values, optional spaces
    * around `=` — the two tolerances real HTML actually needs.
    * Documented approximations (kept for engine portability — RE2 has
    * no lookbehind): the quote pair may mismatch (`"url'`), and a
    * `data-href`-style attribute can match (it still lifts a URL, so
    * a host graph degrades gracefully). Group 1 is the href value;
    * group 2 (present only in [[AnchorRegex]]) the anchor text.
    */
  val HrefRegex: String =
    "<[aA][ \\t][^>]*href[ \\t]*=[ \\t]*['\"]([^'\"]*)['\"]"

  /** [[HrefRegex]] extended with the anchor body as group 2. */
  val AnchorRegex: String = HrefRegex + "[^>]*>([^<]*)</[aA]>"

  /** [[HrefRegex]]/[[AnchorRegex]] as a single-quoted SQL literal for
    * the DuckDB oracle mirrors (quotes doubled; DuckDB passes
    * backslashes through to RE2 verbatim). The ENGINE side uses the
    * raw Scala string via the Column API — no SQL string parsing —
    * because Spark's literal parser treats `''` as juxtaposition, not
    * an escaped quote, so a shared quoted fragment would diverge.
    */
  def sqlPatternLit(re: String): String = re.replace("'", "''")

  def outlinkHostEdges(docs: DataFrame, urlCol: String,
                       htmlCol: String): DataFrame = {
    val srcHost = host(col(urlCol))
    val hrefs = regexp_extract_all(col(htmlCol), lit(HrefRegex), lit(1))
    docs
      .select(srcHost.as("src"), explode(hrefs).as("_href"))
      .withColumn("dst",
        when(col("_href").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
          host(col("_href"))).otherwise(col("src")))
      .filter(col("src") =!= "" && col("dst") =!= "" &&
        col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  /** ANCHOR-TEXT profile: the top-k terms the web uses to LINK to each
    * host — the classic off-page description signal (anchor text
    * describes the destination better than the destination describes
    * itself; search engines and domain classifiers both key on it).
    *
    * Extraction: the two-group [[AnchorRegex]] (attribute- and
    * quote-tolerant), both groups lifted by
    * `regexp_extract_all` (same matches, so the arrays zip
    * positionally); absolute hrefs resolve to their own host,
    * relative ones to the page's host (the [[outlinkHostEdges]]
    * rule). Terms are the lower-cased space tokens of the anchor
    * text. Top-k per destination host rides the
    * [[graft.plans.GroupedTopK]] bounded heaps with the q127 packed
    * order (`n * 2^32 + hash32(term)` — tie-free, oracle-replayable),
    * never a per-host sort. Output: (dst_host, term, n).
    */
  def anchorTexts(docs: DataFrame, urlCol: String, htmlCol: String,
                  k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = docs
      .select(host(col(urlCol)).as("_src"),
        zip_with(
          regexp_extract_all(col(htmlCol), lit(AnchorRegex), lit(1)),
          regexp_extract_all(col(htmlCol), lit(AnchorRegex), lit(2)),
          (h, t) => struct(h.as("href"), t.as("txt"))).as("_links"))
      .select(col("_src"), explode(col("_links")).as("_l"))
      .select(
        when(col("_l.href").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
          host(col("_l.href"))).otherwise(col("_src")).as("dst_host"),
        explode(split(lower(col("_l.txt")), " ")).as("term"))
      .filter(col("dst_host") =!= "" && col("term") =!= "")
      .groupBy(col("dst_host"), col("term"))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .withColumn("_ord",
        col("n") * 4294967296L + graft.Pipeline.wordHash32(col("term")))
    graft.plans.GroupedTopK.perKey(counts, Seq("dst_host"), "_ord", k)
      .select(col("dst_host"), col("term"), col("n"))
  }

  /** Authority-weighted sampling: keep each doc with probability
    * proportional to its HOST's link authority — the crawl-frontier /
    * mix-design composition (extract the outlink graph, rank hosts
    * with integer PageRank, thin the corpus toward endorsed domains).
    * `keep_ppm = (pr(host) * 1e6) div max_pr`, an exact integer
    * derived from the rank frame itself (hosts absent from the graph
    * — never linked, never linking — keep nothing: links are the
    * evidence), decided by the md5-slot draw. `hostRanks` is
    * [[Graph.pageRank]] output over [[outlinkHostEdges]] re-keyed as
    * `(host, pr)`; the max rides a broadcast one-row frame (no driver
    * action). One bounded join; the filter is scan-side.
    */
  def authorityWeightedSample(docs: DataFrame, idCol: String,
                              urlCol: String,
                              hostRanks: DataFrame): DataFrame = {
    val maxPr = hostRanks.agg(coalesce(max(col("pr")), lit(1L)).as("_max_pr"))
    val keyed = hostRanks.select(col("host").as("_rh"),
        col("pr").as("_pr"))
      .crossJoin(broadcast(maxPr))
      .select(col("_rh"),
        expr("(_pr * 1000000L) div greatest(_max_pr, 1L)").as("keep_ppm"))
    docs.withColumn("host", host(col(urlCol)))
      .join(keyed, col("host") === col("_rh"))
      .drop("_rh")
      .filter(
        pmod(graft.Pipeline.wordHash32(col(idCol).cast("string")),
          lit(1000000L)) < col("keep_ppm"))
  }

  /** Structural TEMPLATE fingerprint: the 60-bit hash of a page's
    * opening-tag sequence (`<html><body><h1>...` -> "html body h1 ...")
    * — pages emitted by the same generator share it even when their
    * text is entirely different, so grouping by it finds template
    * families (SEO farms, mirror skins, boilerplate shells) that
    * text-level near-dup never pairs. Scan-side regex + one hash; the
    * downstream group-by is a high-cardinality key aggregate. Closing
    * tags are deliberately excluded — generators vary self-closing
    * style, the opening skeleton is the stable signature.
    */
  def templateFingerprint(docs: DataFrame, idCol: String,
                          htmlCol: String): DataFrame =
    docs.select(col(idCol),
      graft.Pipeline.wordHash60(array_join(
        expr(s"regexp_extract_all($htmlCol, '<([a-zA-Z][a-zA-Z0-9]*)', 1)"),
        " ")).as("tpl_hash"))

  /** Entity subset decoded by [[htmlExtract]] — `&amp;` last so an
    * `&amp;lt;` stays a literal `&lt;` (single-pass semantics).
    */
  private def decodeEntities(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\\\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(e) { case (acc, (from, to)) =>
        s"replace($acc, '$from', '$to')" }

  /** HTML -> visible text, plus the link-density quality signal — the
    * FIRST stage of a web corpus (jusText/trafilatura territory; this
    * is the deterministic regex core of it, engine-portable so the
    * oracle replays it):
    *   - `<script>`/`<style>` blocks removed wholesale (their content
    *     is never visible text);
    *   - remaining tags become spaces, a small entity subset decodes
    *     (`&lt; &gt; &quot; &#39; &nbsp; &amp;` — `&amp;` last, so
    *     `&amp;lt;` stays literal), whitespace collapses;
    *   - `link_chars` = visible chars inside `<a>` elements, cleaned
    *     the same way, and `link_density_ppm = 1e6 * link_chars /
    *     n_chars` — boilerplate-heavy pages (nav, link farms) score
    *     high and feed the quality gates downstream.
    * A pure per-row projection (no shuffle, codegen regex). Output:
    * id, `text`, `n_chars`, `link_chars`, `link_density_ppm`.
    */
  def htmlExtract(docs: DataFrame, idCol: String,
                  htmlCol: String): DataFrame = {
    def clean(e: String): String =
      s"trim(regexp_replace(${decodeEntities(
        s"regexp_replace($e, '<[^>]*>', ' ')")}, '\\\\s+', ' '))"
    docs
      .withColumn("_h", regexp_replace(
        regexp_replace(col(htmlCol), "(?s)<script[^>]*>.*?</script>", " "),
        "(?s)<style[^>]*>.*?</style>", " "))
      .withColumn("_t", expr(clean("_h")))
      .withColumn("_lc", expr(
        s"""aggregate(transform(
              regexp_extract_all(_h, '(?s)<a[^>]*>(.*?)</a>', 1),
              x -> cast(length(${clean("x")}) as bigint)), 0L, (a, x) -> a + x)"""))
      // input columns survive (minus the raw HTML) so the extraction
      // chains straight into the corpus pipeline; a pre-existing
      // `text`/`n_chars` is REPLACED by the extracted view
      .withColumn("text", col("_t"))
      .withColumn("n_chars", length(col("_t")).cast(LongType))
      .withColumn("link_chars", col("_lc"))
      .withColumn("link_density_ppm",
        expr("(1000000L * _lc) div greatest(length(_t), 1)"))
      .drop("_h", "_t", "_lc", htmlCol)
  }

  /** SNAPSHOT DELTA — classify every document of a new crawl snapshot
    * against the previous one, keyed on the canonical URL: `new` (the
    * URL was not in the old snapshot), `changed` (same URL, different
    * content digest), `unchanged` (same URL, same digest). The
    * incremental-crawl primitive: only `new`+`changed` pages flow into
    * the expensive downstream (extraction, quality, near-dup) while
    * `unchanged` reuses last snapshot's verdicts — at a monthly
    * 100 TB recrawl the unchanged share is the majority, so this gate
    * is the single biggest cost lever in the pipeline.
    *
    * Shape: both sides reduce to (url_key, 16-byte digest) scan-side
    * (the text never shuffles), then ONE equi-join on the url key —
    * high-cardinality, evenly spread, map-side projected. If the old
    * snapshot repeats a url key (it shouldn't, post-[[urlDedup]]), its
    * digests are min-merged so the join stays 1:1 and deterministic.
    * Output: idCol, `url_key`, `status`.
    *
    * `detectMoves = true` adds a fourth verdict: `moved` — the URL is
    * new but the body existed in the old snapshot under another URL
    * (site restructures, slug changes) — via one extra digest-keyed
    * join against the old snapshot's distinct digest set; a recrawl
    * pipeline routes `moved` to verdict reuse like `unchanged` instead
    * of re-paying quality + near-dup for a page that merely moved.
    */
  def snapshotDelta(oldDocs: DataFrame, newDocs: DataFrame,
                    idCol: String, urlCol: String,
                    textCol: String, detectMoves: Boolean = false): DataFrame = {
    val base = newDocs
      .select(col(idCol), canonicalUrl(col(urlCol)).as("url_key"),
        md5(col(textCol).cast("binary")).as("_dig"))
      .join(snapshotDigests(oldDocs, urlCol, textCol), Seq("url_key"), "left")
    val classified =
      if (!detectMoves) base
        .withColumn("status",
          when(col("_old_dig").isNull, lit("new"))
            .when(col("_old_dig") === col("_dig"), lit("unchanged"))
            .otherwise(lit("changed")))
      else {
        // moved = the URL is new but the BODY existed somewhere in the
        // old snapshot (site restructures, slug changes): second join
        // against the distinct old digest set, digest-keyed. Only the
        // url-missing rows need it, but a conditional join isn't a
        // plan shape — the left join is cheap (16-byte keys both
        // sides) and the status expression arbitrates.
        val oldDigs = oldDocs
          .select(md5(col(textCol).cast("binary")).as("_dig"))
          .distinct().withColumn("_seen", lit(true))
        base.join(oldDigs, Seq("_dig"), "left")
          .withColumn("status",
            when(col("_old_dig").isNull && col("_seen").isNull, lit("new"))
              .when(col("_old_dig").isNull, lit("moved"))
              .when(col("_old_dig") === col("_dig"), lit("unchanged"))
              .otherwise(lit("changed")))
      }
    classified.select(col(idCol), col("url_key"), col("status"))
  }

  /** The previous snapshot reduced to its delta-join form —
    * `(url_key, _old_dig)`, one row per canonical URL (repeats
    * min-merged so the delta join stays 1:1 and deterministic).
    * Shared by [[snapshotDelta]] and the streaming gate
    * ([[graft.streaming.Streams.streamingSnapshotDelta]]) so the two
    * classifications cannot drift; persist/write this frame once per
    * recrawl and reuse it across both.
    */
  def snapshotDigests(oldDocs: DataFrame, urlCol: String,
                      textCol: String): DataFrame =
    oldDocs
      .select(canonicalUrl(col(urlCol)).as("url_key"),
        md5(col(textCol).cast("binary")).as("_old_dig"))
      .groupBy(col("url_key"))
      .agg(min(col("_old_dig")).as("_old_dig"))

  /** URL PATTERN key: [[canonicalUrl]] with every digit run in the
    * path/query collapsed to `N` — `/article/12345?page=7` and
    * `/article/99?page=2` share `/article/N?page=N`. The alias-FAMILY
    * key (pagination, session counters, numeric slugs), one level
    * blunter than [[canonicalUrlStrong]]: not a dedup key by itself (a
    * news site's every article shares one pattern) but the GROUPING
    * key alias detection needs. Host stays untouched (digits in
    * hostnames are identity: `site1.com` != `site2.com`).
    */
  def urlPatternKey(url: Column): Column = {
    val canon = canonicalUrl(url)
    val hostPart = regexp_extract(canon, "^([a-z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest = regexp_extract(canon, "^[a-z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    when(canon === "", lit(""))
      .otherwise(concat(hostPart, regexp_replace(rest, "[0-9]+", "N")))
  }

  /** ALIAS-FARM detection over [[urlPatternKey]] families: per URL
    * pattern, how many URLs it mints vs how many DISTINCT bodies those
    * URLs serve — `alias_ppm = 1e6 · (n_urls − n_bodies) / n_urls`. A
    * pattern with thousands of URLs and one body is a session-id /
    * print-view / tracking-alias farm: feed its keys to the crawl
    * frontier's skip list and collapse its corpus rows before text
    * dedup pays for them. One (pattern, digest)-keyed count + one
    * pattern rollup, both map-side combined; digests travel, bodies
    * never do. Output: (url_pattern, n_urls, n_bodies, alias_ppm).
    */
  def urlPatternStats(docs: DataFrame, urlCol: String,
                      textCol: String): DataFrame =
    docs
      .select(urlPatternKey(col(urlCol)).as("url_pattern"),
        md5(col(textCol).cast("binary")).as("_dig"))
      .groupBy(col("url_pattern"), col("_dig"))
      .agg(count(lit(1)).cast(LongType).as("_n"))
      .groupBy(col("url_pattern"))
      .agg(sum(col("_n")).cast(LongType).as("n_urls"),
        count(lit(1)).cast(LongType).as("n_bodies"))
      .withColumn("alias_ppm",
        expr("(1000000L * (n_urls - n_bodies)) div n_urls"))

  /** Per-DOMAIN boilerplate line removal (the RefinedWeb/C4 move at
    * the ownership boundary): a line that appears in >= `minDf`
    * DISTINCT documents of one registrable domain is template chrome
    * (nav, footer, cookie banner, copyright) and is stripped from
    * every document of that domain; the same line on another domain is
    * untouched (a quote going viral is content there). Complements
    * [[TextStats.stripDuplicateSpans]] (corpus-wide fixed token spans)
    * and [[TextStats.boilerplatePrefixes]] (document-opening prefixes)
    * with the per-site LINE granularity real web chrome has.
    *
    * Shape: lines shuffle once as (domain, 60-bit line hash, id)
    * triples for the distinct-doc df (two map-side-combined
    * aggregates); the hot-line frame (bounded by template lines per
    * domain, far smaller than the corpus) equi-joins back; reassembly
    * is one doc-keyed aggregate ordered by line index, state bounded
    * by the document's own length. Returns
    * (idCol, textCol, n_lines, n_removed) — a fully-boilerplate doc
    * keeps its row with an empty string.
    */
  def domainBoilerplateStrip(docs: DataFrame, idCol: String, urlCol: String,
                             textCol: String, minDf: Int = 3,
                             sep: String = "\n"): DataFrame = {
    require(minDf >= 2, s"minDf below 2 would delete every line, got $minDf")
    val lines = docs
      .select(col(idCol), registrableDomain(col(urlCol)).as("_reg"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("_i", "_l")))
      .withColumn("_lh", graft.Pipeline.wordHash60(col("_l")))
    val hot = lines
      .select(col("_reg"), col("_lh"), col(idCol))
      .distinct()
      .groupBy(col("_reg"), col("_lh"))
      .agg(count(lit(1)).cast(LongType).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col("_reg"), col("_lh"), lit(true).as("_hot"))
    lines.join(hot, Seq("_reg", "_lh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast(LongType).as("n_lines"),
        sum(when(col("_hot"), 1L).otherwise(0L)).cast(LongType)
          .as("n_removed"),
        // collect_list skips the nulls the `when` leaves for hot
        // lines; the struct sort restores document order
        array_join(transform(
          array_sort(collect_list(when(col("_hot").isNull,
            struct(col("_i"), col("_l"))))),
          x => x.getField("_l")), sep).as(textCol))
      .select(col(idCol), col(textCol), col("n_lines"), col("n_removed"))
  }

  /** robots.txt -> `(host, prefix)` Disallow rules for `User-agent: *`.
    * Robots group semantics, deterministically: a BLOCK is one or more
    * consecutive `User-agent:` lines followed by its rule lines; a
    * `Disallow:` applies to every agent declared in its block's
    * header, so the block counts as ours iff any of those agents is
    * `*`. Comments (`#...`) and a trailing `\r` are stripped first;
    * an empty `Disallow:` (allow-all) emits no rule. Matching is
    * case-insensitive on the directive, exact on the path prefix.
    *
    * Shape: one line explode per robots file, then two host-partitioned
    * windows over LINE counts (robots files are a few KB — the
    * partition is bounded by file size, never by corpus size), one
    * (host, block)-keyed max for the star flag. Output one row per
    * (host, prefix).
    */
  def robotsRules(robots: DataFrame, hostCol: String,
                  contentCol: String): DataFrame = {
    val byIdx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("_i"))
    robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(contentCol), "\n")).as(Seq("_i", "_raw")))
      // comment + CR strip, then trim
      .withColumn("_ln", trim(regexp_replace(col("_raw"), "[#\r].*$", "")))
      .withColumn("_agent",
        lower(trim(regexp_extract(col("_ln"), "(?i)^user-agent\\s*:(.*)$", 1))))
      .withColumn("_is_agent",
        col("_ln").rlike("(?i)^user-agent\\s*:"))
      // block starts at an agent line NOT preceded by an agent line
      .withColumn("_starts", when(col("_is_agent") &&
        !coalesce(lag(col("_is_agent"), 1).over(byIdx), lit(false)), 1L)
        .otherwise(0L))
      .withColumn("_blk", sum(col("_starts")).over(byIdx))
      .withColumn("_star", max(when(col("_is_agent") &&
          col("_agent") === "*", 1).otherwise(0))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("host"), col("_blk"))) === 1)
      .withColumn("prefix",
        trim(regexp_extract(col("_ln"), "(?i)^disallow\\s*:(.*)$", 1)))
      .filter(col("_star") && col("prefix") =!= "" &&
        col("_ln").rlike("(?i)^disallow\\s*:"))
      .select(col("host"), col("prefix"))
      .distinct()
  }

  /** Apply [[robotsRules]]-shaped `(host, prefix)` rules to a corpus:
    * drop every document whose URL path starts with a disallowed
    * prefix for its (exact) host — the crawl-politeness filter run
    * retroactively over an already-fetched corpus (a crawler that
    * honored robots at fetch time still re-screens when sites change
    * their policy between snapshots).
    *
    * Shape: paths extract scan-side; the rules frame is per-host tiny
    * (a few prefixes per host) and joins BROADCAST against the corpus
    * on the host key, prefix check scan-side, blocked ids out via one
    * anti-join — the corpus never shuffles.
    */
  def robotsFilter(docs: DataFrame, idCol: String, urlCol: String,
                   rules: DataFrame): DataFrame = {
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]*([^?#]*)", 1)
    val blocked = docs
      .select(col(idCol), host(col(urlCol)).as("host"), path.as("_path"))
      .join(broadcast(rules.select(col("host"), col("prefix"))), Seq("host"))
      .filter(col("_path").startsWith(col("prefix")))
      .select(col(idCol)).distinct()
    docs.join(blocked, Seq(idCol), "left_anti")
  }

  /** DOMAIN-level score gate: aggregate a per-document score to its
    * registrable domain and drop every document of a domain whose MEAN
    * score falls below the threshold — the RefinedWeb/FineWeb-style
    * "judge the site, not the page" curation step (a spam farm's
    * individual pages can each sneak past a per-page gate; their
    * domain mean cannot). Domains with fewer than `minDocs` documents
    * are kept — too little evidence to damn a site.
    *
    * Shape: one domain-keyed partial-agg shuffle over (domain, score)
    * pairs (the documents themselves don't move), then one equi-join
    * of the bounded per-domain verdict frame back onto the corpus —
    * broadcast when small, AQE otherwise. Output: the surviving rows
    * plus `reg_domain`, `domain_docs`, `domain_mean_micro` audit
    * columns.
    */
  def domainScoreGate(docs: DataFrame, idCol: String, urlCol: String,
                      scoreCol: String, minDocs: Int = 3,
                      minMeanMicro: Long = 0L): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val verdict = docs
      .select(registrableDomain(col(urlCol)).as("reg_domain"),
        col(scoreCol).cast(LongType).as("_s"))
      .groupBy(col("reg_domain"))
      .agg(count(lit(1)).cast(LongType).as("domain_docs"),
        sum(col("_s")).as("_sum"))
      // integer mean (micro units survive): engine-portable `div`
      .withColumn("domain_mean_micro", expr("_sum div domain_docs"))
      .filter(col("domain_docs") < minDocs ||
        col("domain_mean_micro") >= minMeanMicro)
      .drop("_sum")
    docs.withColumn("reg_domain", registrableDomain(col(urlCol)))
      .join(verdict, Seq("reg_domain"))
  }
}
