package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility (r18 optimization round): dump the post-AQE
  * `explain("formatted")` plan of named queries, one file per query —
  * the before/after evidence trail under `plans/r18/`.
  *
  * Usage: `sbt "runMain graft.PlanSnap <sfDir> <outDir> <suffix> <q> [<q> ...]"`
  * writes `<outDir>/<query>_<suffix>.txt`. Each query is fully evaluated
  * first so the dumped plan is the executed one (AQE final plan).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanSnap <sfDir> <outDir> <suffix> <query> [<query> ...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // finalize AQE
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"[plansnap] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
