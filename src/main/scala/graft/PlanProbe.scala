package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: AQE stage-reuse probe. Prints, per query, the total vs
  * DISTINCT shuffle/broadcast query-stage ids in the executed plan — equal
  * counts mean NO stage is reused and every shared subtree recomputes
  * (the diagnosis behind the r9 text-family pinning; see PLANS.md).
  *
  * Usage: `sbt "runMain graft.PlanProbe <sfDir> <query> [<query> ...]"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      val df = SparkEntry.queries(q)(spark, args.head)
      df.collect()
      val es = df.queryExecution.executedPlan.toString
      val stageIds = "(ShuffleQueryStage|BroadcastQueryStage) (\\d+)".r
        .findAllMatchIn(es).map(_.group(2)).toSeq
      println(s"PROBE $q stages_total=${stageIds.length} stages_distinct=${stageIds.distinct.length} " +
        s"scans=${"Scan parquet".r.findAllIn(es).length}")
    }
    spark.stop()
  }
}
