package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.HllRegisterExpressions.{hllRegisterEst, registerMax}
import graft.plans.PairEnumExpressions.sortedPairs

/** Equivalence specs for the round-18 packed kernels — the new
  * internals behind hyperBallProfile (RegisterMax +
  * HllRegisterEstimate) and the Adamic–Adar wedge enumeration
  * (SortedPairs) — against the exact row-form / HOF formulations they
  * replaced, on generated inputs including the degenerate shapes
  * (empty/singleton arrays, full register tables, max-rho entries).
  */
class PackedKernelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("RegisterMax == row-form per-(node,bucket) MAX on random registers") {
    val p = 6
    val m = 1 << p
    val rnd = new scala.util.Random(42)
    val rows = (1 to 3000).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(m), rnd.nextInt(61 - p) + 1))
    val df = rows.toDF("node", "bucket", "rho")
    val rowForm = df.groupBy("node", "bucket")
      .agg(max("rho").as("r"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val packed = df
      .select(col("node"), expr(
        s"transform(sequence(0, ${m - 1}), i -> IF(i = bucket, rho, 0))")
        .as("_rs"))
      .groupBy("node").agg(registerMax(col("_rs"), m).as("_rs"))
      .select(col("node"), posexplode(col("_rs")))
      .filter(col("col") > 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(packed == rowForm)
  }

  test("HllRegisterEstimate == integer RAW estimator + LC branch (p=6, p=8)") {
    for (p <- Seq(6, 8)) {
      val m = 1 << p
      val rnd = new scala.util.Random(7 + p)
      val tables = (1 to 60).map { i =>
        val nb = i match {
          case 1 => 1      // single register (the N(0) shape)
          case 2 => m      // full table (raw branch, nb = m)
          case 3 => m - 1  // LC index boundary
          case _ => 1 + rnd.nextInt(m)
        }
        val arr = Array.fill(m)(0)
        rnd.shuffle((0 until m).toList).take(nb)
          .foreach(b => arr(b) = 1 + rnd.nextInt(61 - p))
        (i.toLong, arr.toSeq)
      }
      val df = tables.toDF("id", "rs")
      // reference: the row-form hllEstimate + the LC CASE exactly as
      // the round-17 hyperBallProfile wrote it
      val rows = df.select(col("id"), posexplode(col("rs")))
        .filter(col("col") > 0)
        .select(col("id"), col("pos").cast("long").as("bucket"),
          col("col").cast("long").as("r"))
      val lcArr = graft.ops.Graph.lcTable(p).mkString("array(", "L, ", "L)")
      val ref = graft.ops.Sketches.hllEstimate(rows, Seq("id"), p)
        .select(col("id"), expr(
          s"CASE WHEN n_buckets < $m AND est_distinct < ${5 * m / 2}" +
            s" THEN element_at($lcArr, CAST($m - n_buckets AS INT))" +
            " ELSE est_distinct END").cast("long").as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = df
        .select(col("id"),
          hllRegisterEst(col("rs"), p, graft.ops.Graph.lcTable(p)).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"p=$p")
    }
  }

  test("SortedPairs == nested-HOF enumeration, order included (longs)") {
    val rnd = new scala.util.Random(11)
    val arrs = (1 to 50).map(i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => rnd.nextLong() % 1000)
        .sorted))
    val df = arrs.toDF("id", "ns")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val hof = norm(df.select(col("id"), posexplode(expr(
        """flatten(transform(ns, (x, i) ->
             transform(slice(ns, i + 2, size(ns) - i - 1),
               y -> struct(x AS u, y AS v))))""")))
      .select(col("id"), col("pos"), col("col.u"), col("col.v")).collect())
    val krn = norm(df.select(col("id"), posexplode(sortedPairs(col("ns"))))
      .select(col("id"), col("pos"), col("col.u"), col("col.v")).collect())
    assert(krn == hof)
  }

  test("SortedPairs == nested-HOF enumeration (struct elements, q309 shape)") {
    val rnd = new scala.util.Random(13)
    val arrs = (1 to 40).map(i =>
      (i.toLong, (0 until rnd.nextInt(10)).map(_ => rnd.nextInt(1000).toLong)
        .sorted))
    val sdf = arrs.toDF("id", "ns0")
      .select(col("id"),
        expr("transform(ns0, x -> struct(x AS n, x % 7 AS h))").as("ns"))
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2)).toSeq
    val hof = norm(sdf.select(col("id"), posexplode(expr(
        """flatten(transform(ns, (x, i) ->
             transform(slice(ns, i + 2, size(ns) - i - 1),
               y -> struct(x.n AS un, y.n AS vn, x.h AS uh, y.h AS vh))))""")))
      .select(col("id"), col("pos"), col("col.un"), col("col.vn"),
        col("col.uh"), col("col.vh")).collect())
    val krn = norm(sdf.select(col("id"), posexplode(sortedPairs(col("ns"))))
      .select(col("id"), col("pos"), col("col.u.n"), col("col.v.n"),
        col("col.u.h"), col("col.v.h")).collect())
    assert(krn == hof)
  }
}
