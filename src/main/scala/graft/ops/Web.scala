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
  def hostStats(docs: DataFrame, urlCol: String,
                textCol: String): DataFrame =
    docs
      .select(host(col(urlCol)).as("host"),
        size(words(col(textCol))).cast(LongType).as("_t"))
      .groupBy(col("host"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("_t")).cast(LongType).as("n_tokens"))

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
                    maxDocsPerHost: Long): DataFrame = {
    require(maxDocsPerHost >= 1,
      s"maxDocsPerHost must be >= 1, got $maxDocsPerHost")
    val withHost = docs.withColumn("host", host(col(urlCol)))
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
}
