package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline.words

/** Inverted-index-style retrieval over a tokenized corpus.
  *
  * Spark-first shape: there is no materialized index structure — the
  * "posting list probe" is a scan-side token filter (only matching
  * tokens survive the explode, so the shuffled volume is proportional
  * to the query terms' postings, exactly like reading posting lists),
  * followed by one doc-key aggregation and a TakeOrderedAndProject.
  * At rest the corpus would be bucketed by doc id; the term filter is
  * pushed into the scan projection either way.
  */
object Search {

  /** Conjunctive (AND) keyword search: documents containing EVERY term
    * in `terms`, ranked by total term frequency (integer — exact and
    * engine-portable; ties broken by ascending id), top `k`.
    *
    * The aggregate keeps two integers per doc (total tf + distinct-term
    * count); the conjunctive gate is `n_terms == terms.size`. The final
    * top-k is a TakeOrderedAndProject — per-partition bounded heaps,
    * never a global sort of all matches.
    */
  def keywordSearch(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "keywordSearch needs at least one term")
    require(terms.distinct.size == terms.size, s"duplicate terms in $terms")
    require(k > 0, s"k must be positive, got $k")
    docs
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("tf_total"),
        count_distinct(col("w")).as("n_terms"))
      .filter(col("n_terms") === terms.size)
      .select(col(idCol), col("tf_total"))
      .orderBy(col("tf_total").desc, col(idCol))
      .limit(k)
  }
}
