package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev/report main: score all ten ANN paths on the shared planted fixture
  * ([[graft.etl.AnnQuality]]) and write the round-snapshot table
  * (ANN_REPORT.md by default; pass an output path as arg 1). */
object AnnReport {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("ANN_REPORT.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val md = graft.etl.AnnQuality.reportMarkdown(graft.etl.AnnQuality.score(spark))
    Files.writeString(Paths.get(out), md)
    println(md)
    spark.stop()
  }
}
