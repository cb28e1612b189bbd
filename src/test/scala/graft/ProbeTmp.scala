package graft
import org.apache.spark.sql.functions._
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("4", "probe")
    import spark.implicits._
    def doc(g: Int, m: Int): String =
      ((0 until 17).map(j => s"g${g}w$j") ++ (17 until 20).map(j => s"g${g}m${m}v$j")).mkString(" ")
    val docs = (for { g <- 0 until 8; m <- 0 until 6 } yield ((g*10+m).toLong, doc(g,m))).toDF("doc_id","text")
    val sig = Dedup.shingleSignatures(docs, "doc_id", "text")
    val two = sig.filter(col("doc_id").isin(20L, 21L)).select("sig").collect()
    val (s0, s1) = (two(0).getSeq[Long](0), two(1).getSeq[Long](0))
    println("AGREE20_21=" + s0.zip(s1).count(p => p._1 == p._2))
    val ver = Dedup.verifiedPairs(sig, "doc_id", 0.5)
    println("VERIFIED=" + ver.count())
    val labels = Dedup.clusters(ver, docs.select("doc_id"), "doc_id")
    val byG = labels.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1 / 10)
    byG.toSeq.sortBy(_._1).foreach { case (g, rows) =>
      println(s"G${g}LABELS=" + rows.sortBy(_._1).map(_._2).mkString(",")) }
    spark.stop()
  }
}
