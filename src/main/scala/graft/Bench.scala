package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark harness: per-query wall seconds on $SPARK_GRAFT_SF_DIR.
  *
  * Measurement discipline:
  *  - one untimed warmup pass over every query first, so JVM/JIT/codegen
  *    warmup does not land on the first measured query;
  *  - each timed run fully evaluates the plan via a noop-format write —
  *    a bare `count()` lets Catalyst drop the final sorts/projections that
  *    Verify actually pays for;
  *  - n=2 timed runs per query, report the min;
  *  - the result JSON is printed as the LAST stdout line (bare, parseable;
  *    build.sbt routes forked stdout through StdoutOutput so sbt adds no
  *    `[info]` prefix) and is also written to $SPARK_GRAFT_BENCH_OUT if set.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as raw long (Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native function surface (cosine_similarity et al.)
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def evalOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try evalOnce(n)
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n failed: $e") }
    }
    val results = names.map { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { evalOnce(n); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      n -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p => Files.writeString(Paths.get(p), json))
    println(json)
    spark.stop()
  }
}
