package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Scale-technique specs: salted skew handling and bucketed
  * (co-located, shuffle-free) joins.
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted two-stage aggregation equals the direct aggregate") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCountSum(li, "l_orderkey", "l_quantity", salts = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == direct.keySet)
    // counts exact; sums within fp tolerance (different add order)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-6)
    }
  }

  test("salted join equals the plain join") {
    val orders = Tables.orders(spark, sf).select(col("o_custkey").as("k"), col("o_orderkey"))
    val dim = Tables.customer(spark, sf).select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = orders.join(dim, "k").count()
    val salted = Skew.saltedJoin(orders, dim, "k", salts = 4).count()
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    import java.nio.file.Files
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(spark, sf)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.customer(spark, sf)
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val shuffles = j.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be co-located, found ${shuffles.size} shuffles")
      assert(j.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
