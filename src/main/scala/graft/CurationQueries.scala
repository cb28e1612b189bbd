package graft

import org.apache.spark.sql.functions._

/** Round-9 curation queries (q140+): exact n-gram decontamination,
  * bigram-model information scoring, BPE merge-pair mining,
  * target-distribution mixing, embedding-diversity audit, degenerate-
  * repetition screening, and quantile bucketing.
  *
  * Same oracle discipline as PipelineQueries/AnalysisQueries: integer
  * arithmetic wherever a float would be order- or rounding-sensitive
  * (bit-length for log2, ppm/micro-unit divisions, md5-hash
  * determinism), and every DuckDB mirror replays the identical math.
  */
object CurationQueries {
  import Tables._

  // Oracle mirror of Pipeline.wordHash60: first 15 md5 hex digits
  // folded to a 60-bit BIGINT (the membership/join key recipe).
  private def hash60Sql(e: String): String =
    s"""list_reduce([strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1 for i in range(1, 16)],
                    (a, b) -> a*16 + b)"""

  // Oracle mirror of Pipeline.wordHash32 (the md5-slot recipe).
  private def hash32Sql(e: String): String =
    s"""list_reduce([strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1 for i in range(1, 9)],
                    (a, b) -> a*16 + b)"""

  val all: Seq[QueryDef] = Seq(

    // EXACT n-gram decontamination ([[Dedup.exactNgramOverlap]]): per
    // train doc, the count of its distinct 4-grams appearing anywhere
    // in the eval corpus (source 'src0' plays the eval set, as in
    // q61). Membership is exact — no LSH banding lottery; recall at
    // the n-gram definition is 1.0 by construction. Both sides join on
    // the 60-bit gram hash (8 B through the shuffle), and the oracle
    // replays the hashed join verbatim. n=4 is this corpus's operating
    // point (3-grams flag every doc, 5-grams almost none — production
    // corpora with real sentences run n=8..13).
    QueryDef("q140_exact_decontamination",
      Some(s"""
        WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, source,
                 list_distinct([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS grams
               FROM w WHERE len(w) >= 4),
        ev AS (SELECT DISTINCT ${hash60Sql("g")} AS e
               FROM (SELECT unnest(grams) AS g FROM sh WHERE source = 'src0')),
        tr AS (SELECT doc_id, ${hash60Sql("g")} AS h
               FROM (SELECT doc_id, unnest(grams) AS g FROM sh WHERE source <> 'src0'))
        SELECT tr.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM tr JOIN ev ON tr.h = ev.e
        GROUP BY tr.doc_id ORDER BY doc_id"""),
      (s, d) => {
        val docs = spread(documents(s, d))
        Dedup.exactNgramOverlap(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 4)
          .orderBy("doc_id")
      })
  )
}
