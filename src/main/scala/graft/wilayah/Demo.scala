package graft.wilayah

import org.apache.spark.sql.SparkSession

/** Executable usage example: seed + sync + every query entry point,
  * against the corpus dir in arg0 (default /root/reference/geojson)
  * and a temp warehouse. `sbt "runMain graft.wilayah.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val geojsonDir = args.headOption.getOrElse("/root/reference/geojson")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("graft-demo").toString + "/warehouse"
    val api = new Api(spark, wh, geojsonDir)

    println(s"seed: processed=${api.seed()}")
    println(s"sync 11.73: processed=${api.sync("11.73")}")
    println(s"status 11.73: ${api.status("11.73")}")
    println(s"status 11:    ${api.status("11")}")
    println("search 'lhok':")
    api.search("lhok").show(truncate = false)
    val fc = api.geojson("11.73")
    println(s"geojson slots: ${fc.keySet}")
    println(s"kabupaten FC head: ${fc("kabupaten").take(160)}...")
    println(s"seed again (idempotent): processed=${api.seed()}")
    println("passthrough '11':")
    api.passthrough("11").select("file_name", "slot", "size_bytes").show(truncate = false)
    spark.stop()
  }
}
