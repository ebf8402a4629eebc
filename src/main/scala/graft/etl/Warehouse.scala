package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Warehouse maintenance (SURVEY.md §4 layout notes): streaming upserts and
  * per-batch incremental writes accumulate small files; scans then pay one
  * task + one open per fragment. Compaction rewrites a parquet dataset into
  * ~`targetMB` files sized from the ACTUAL on-disk bytes (not row counts —
  * compression ratios vary per column mix), using the same write-aside +
  * atomic-swap pattern as the streaming upsert sink. */
object Warehouse {

  /** Total parquet bytes under `path` (driver-side FS listing — metadata
    * only, no data read). */
  private def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Compact `path` in place; returns the file count written. */
  def compact(spark: SparkSession, path: String, targetMB: Int = 128): Int = {
    val nFiles = math.max(1L,
      (dataBytes(spark, path) + targetMB * 1024L * 1024 - 1) / (targetMB * 1024L * 1024))
    val staging = new Path(path + "__compacting")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(path)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(staging.toString)
    val cur = new Path(path)
    fs.delete(cur, true)
    fs.rename(staging, cur)
    nFiles.toInt
  }
}
