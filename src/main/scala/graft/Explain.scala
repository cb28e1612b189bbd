package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("8", "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (n <- args) {
      println(s"===== $n =====")
      Queries.byName(n).build(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
