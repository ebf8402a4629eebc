package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time individual queries without a full Bench sweep.
  *
  * Usage: `sbt "runMain graft.QueryTimer <sfDir> <query> [<query> ...]"`.
  * Same session config and measurement discipline as Bench (warmup pass,
  * noop-write full evaluation, min of 2 timed runs).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTimer <sfDir> <query> [<query> ...]")
    val sfDir = args.head
    val names = args.tail.toSeq
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
    def evalOnce(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    names.foreach(evalOnce) // warmup
    names.foreach { n =>
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); evalOnce(n); (System.nanoTime() - t0) / 1e9
      }
      println(f"[timer] $n%-28s ${secs.min}%.3f s")
    }
    spark.stop()
  }
}
