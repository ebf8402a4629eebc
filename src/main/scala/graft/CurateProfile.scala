package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (not part of the declared surface): stage-level wall-time
  * breakdown of the corpus-curation funnel under the driver's exact bench
  * config, to attribute `q_corpus_curate`'s cost to its component passes.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.CurateProfile /root/testdata/sf0.1"`.
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.GraftFunctions.ensureRegistered(spark)
    import graft.queries.{Llm, LlmText}

    def time(label: String)(df: => DataFrame): Unit = {
      // warmup + min of 2, same discipline as Bench
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = Seq(once(), once()).min
      println(f"[profile] $label%-34s $best%.3f s")
    }

    val d0 = Tables.documents(spark, sfDir)
    time("scan")(d0)
    time("quality_score")(LlmText.qQualityScore(spark, sfDir))
    time("repetition_filter")(LlmText.qRepetitionFilter(spark, sfDir))
    val qok = LlmText.qQualityScore(spark, sfDir)
      .filter(col("kept")).select(col("doc_id"), lit(true).as("qok"))
    val rok = LlmText.qRepetitionFilter(spark, sfDir)
      .filter(!col("flagged")).select(col("doc_id"), lit(true).as("rok"))
    def f3 = d0.select(col("doc_id"), col("source"), col("text"))
      .join(qok, Seq("doc_id"), "left")
      .join(rok, Seq("doc_id"), "left")
      .withColumn("s1", col("source") =!= "src0")
      .withColumn("s2", col("s1") && coalesce(col("qok"), lit(false)))
      .withColumn("s3", col("s2") && coalesce(col("rok"), lit(false)))
    time("f3 flag frame")(f3)
    def canonical = f3.filter(col("s3"))
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("cok"))
    def f4 = f3.join(canonical, Seq("doc_id"), "left")
      .withColumn("s4", col("s3") && coalesce(col("cok"), lit(false)))
    time("f4 (+exact dedup)")(f4)
    time("minhash pairs on s4")(
      Llm.minhashPairs(f4.filter(col("s4")).select("doc_id", "text")))
    time("cc on s4 star edges")(Llm.dedupGroups(
      Llm.minhashCcEdges(f4.filter(col("s4")).select("doc_id", "text"))))
    val evalGrams = Llm.gram4Rows(d0.filter(col("source") === "src0"))
      .select("gram").distinct()
    time("contamination branch")(
      Llm.gram4Rows(d0).select("doc_id", "gram")
        .join(evalGrams, Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct())
    time("FULL q_corpus_curate")(graft.etl.CorpusPipeline.qCorpusCurate(spark, sfDir))
    spark.stop()
  }
}
