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
  *  - n=2 timed runs per query, report the min (adaptive repeats up to 4
  *    while the two best runs disagree by more than the min);
  *  - a fixed pure-CPU CANARY interleaves through the sweep; the JSON
  *    carries its median vs a frozen idle band (`canary_sec`,
  *    `canary_ratio`, `contended`) so a contended total self-identifies;
  *  - `n_run`/`n_reported` make the stdout line's slowest-prefix cutoff
  *    explicit (the file sidecar always carries every query);
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
      // reliable-checkpoint files (pinShared under a checkpoint dir) are
      // never deleted by default; let the ContextCleaner reclaim them
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // native function surface (cosine_similarity et al.)
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def evalOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // CONTENTION CANARY (r13 judge #3): adaptive repeats cannot catch
    // CONSISTENT ambient load (both runs inflate together — three of four
    // rounds needed a judge re-run to adjudicate a contended driver sweep).
    // A fixed pure-CPU probe (sum of 64M codegen'd hashes across all
    // cores, no IO, no data dependence) interleaves through the timed
    // sweep; its MEDIAN against the frozen idle band lets the artifact
    // self-identify a contended total. Idle band measured on the target
    // machine (local[32]): steady-state median 0.22 s (range 0.17–0.23
    // over 8 post-warmup runs); a 24-core synthetic load moved the median
    // to 0.33 s. Re-measure and re-freeze if the hardware changes.
    val canaryIdleSec = 0.22
    val canaryContendedRatio = 1.35
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(64L * 1000 * 1000).selectExpr("sum(hash(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Dev aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run to named
    // queries while iterating on one plan. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    canaryOnce() // codegen/JIT warmup for the canary body itself
    names.foreach { n =>
      try evalOnce(n)
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n failed: $e") }
    }
    // A query that throws during a timed run must SURFACE, not silently
    // shrink the total: it lands in "errors" (first exception message) and
    // its per-query time is reported as -1 — an explicit broken marker the
    // 2x gate can see, instead of a quietly-faster-looking bench.
    // (name, min seconds, spread, error). Spread = gap between the two
    // FASTEST runs — the convergence signal for the reported min. It makes
    // ambient machine contention VISIBLE in the artifact: a wide spread
    // says the number is noise-dominated, which two rounds of driver-sweep
    // adjudication previously required a judge re-run to see.
    // ADAPTIVE REPEATS (r12 judge #7): two runs can BOTH be contended
    // (r12: q_warehouse_etl spread 26.7 on min 2.8), so while the two best
    // runs still disagree by more than the min itself, run another repeat
    // (cap 4 total) — the headline total then converges on an idle-machine
    // number even when the sweep starts under contention.
    val canarySamples = scala.collection.mutable.ArrayBuffer(canaryOnce())
    val results: Seq[(String, Double, Double, Option[String])] =
      names.zipWithIndex.map { case (n, qi) =>
      // one canary sample every 12 queries, riding INSIDE the sweep so the
      // probe sees exactly the ambient conditions the measurements did
      if (qi % 12 == 11) canarySamples += canaryOnce()
      def timed(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try Right { evalOnce(n); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      }
      var runs = Vector(timed(), timed())
      def best2 = runs.collect { case Right(s) => s }.sorted.take(2)
      def spread = if (best2.size < 2) 0.0 else best2(1) - best2(0)
      while (runs.size < 4 && best2.nonEmpty && spread > best2.head)
        runs :+= timed()
      val ok = runs.collect { case Right(s) => s }
      if (ok.nonEmpty) (n, ok.min, spread, None)
      else (n, -1.0, 0.0, Some(runs.collectFirst { case Left(m) => m }.get))
    }
    canarySamples += canaryOnce()
    val canaryMedian = canarySamples.sorted.apply(canarySamples.length / 2)
    val canaryRatio = canaryMedian / canaryIdleSec
    val contended = canaryRatio > canaryContendedRatio
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "'").replace("\n", " ")
    // The driver parses the JSON from a bounded 2000-char tail of stdout, and
    // sbt's trailing "[success] ..." line consumes ~76 of those — the JSON
    // line must stay under ~1900 chars or the round report comes back
    // unparsed (r03 failed exactly this way at 67 full-precision doubles).
    // Render at 2-decimal seconds (10 ms granularity is far below run noise)
    // with trailing zeros stripped, then degrade to 1/0 decimals if the
    // query count ever pushes the line over the window.
    // Locale.ROOT: a comma-decimal default locale (de_DE …) would render
    // "1,00" and corrupt the JSON line.
    def sec(v: Double, dp: Int) = {
      val s = s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val nErr = results.count(_._4.isDefined)
    val errPart =
      if (nErr == 0) ""
      else {
        val errs = results.collect { case (k, _, _, Some(m)) => "\"" + k + "\":\"" + esc(m) + "\"" }
          .mkString("{", ",", "}")
        s""","n_errors":$nErr,"errors":$errs"""
      }
    val sfName = Paths.get(sfDir).getFileName.toString
    // Self-description (r13 judge #3/#8): n_run vs n_reported makes the
    // stdout line's slowest-prefix cutoff explicit (round-over-round diffs
    // of the queries map gain/lose members by timing, not by regression),
    // and the canary triple lets the artifact adjudicate ambient machine
    // contention without a judge re-run: contended=true means the probe's
    // in-sweep median exceeded the frozen idle band by >35%.
    def selfPart(nReported: Int): String =
      s""","n_run":${results.length},"n_reported":$nReported""" +
        s""","canary_sec":${sec(canaryMedian, 2)}""" +
        s""","canary_ratio":${sec(canaryRatio, 2)},"contended":$contended"""
    def render(dp: Int, withSpread: Boolean = false): String = {
      val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + sec(v, dp) }
        .mkString("{", ",", "}")
      // per-query |run1 - run2|: sidecar-only (no stdout line budget there)
      val spreadPart =
        if (!withSpread) ""
        else s""","spread":${results.map { case (k, _, sp, _) =>
          "\"" + k + "\":" + sec(sp, dp) }.mkString("{", ",", "}")}"""
      s"""{"metric":"total","value":${sec(total, dp max 2)},"unit":"sec","queries":$qs$spreadPart$errPart${selfPart(results.length)},"sf":"$sfName"}"""
    }
    // Budget: the driver keeps a 2000-char stdout tail; sbt's trailing
    // "[success] Total time: ..." line + newlines eat ~76, so the JSON line
    // must stay ≤ ~1924 (1895 leaves slack). Past ~105 queries even a
    // UNIFORM 0-decimal map no longer fits — and 0-decimal values carry no
    // signal for the sub-second majority anyway. So the stdout line carries
    // a STRICT slowest-prefix at 2-decimal precision (every omitted query
    // is no slower than every included one), and self-describes what it
    // dropped ("n_omitted" fast queries summing to "omitted_total" seconds
    // — by construction each ≤ the fastest included). "value" is always the
    // full-suite total. The $SPARK_GRAFT_BENCH_OUT file sidecar has no
    // length budget and remains the authoritative per-query record (all
    // queries, 3 decimals). Errored queries (-1 sentinel) are always
    // included so a broken query can never hide in the omitted tail.
    // r11 judge item #5: the stdout artifact must self-adjudicate ambient
    // machine contention (three rounds of driver-sweep spikes needed a judge
    // re-run to diagnose). The full per-query spread lives in the file
    // sidecar; the stdout line carries spread for just the ~10 slowest
    // queries — exactly the ones whose spikes drive the headline total — so
    // a contended sweep shows |run1 - run2| gaps right in BENCH_r{N}.json.
    val spreadTop: Set[String] =
      results.filter(_._2 >= 0).sortBy(-_._2).take(10).map(_._1).toSet
    def renderTop(include: Set[String]): String = {
      val inc = results.filter { case (k, _, _, _) => include.contains(k) }
      val omitted = results.filterNot { case (k, _, _, _) => include.contains(k) }
      val qs = inc.map { case (k, v, _, _) => "\"" + k + "\":" + sec(v, 2) }
        .mkString("{", ",", "}")
      val spreads = inc.filter { case (k, _, _, _) => spreadTop.contains(k) }
      val spreadPart =
        if (spreads.isEmpty) ""
        else s""","spread":${spreads.map { case (k, _, sp, _) =>
          "\"" + k + "\":" + sec(sp, 2) }.mkString("{", ",", "}")}"""
      val omitPart =
        if (omitted.isEmpty) ""
        else s""","n_omitted":${omitted.length},"omitted_total":${sec(omitted.map(_._2).filter(_ >= 0).sum, 2)}"""
      s"""{"metric":"total","value":${sec(total, 2)},"unit":"sec","queries":$qs$spreadPart$omitPart$errPart${selfPart(inc.length)},"sf":"$sfName"}"""
    }
    var include = results.filter(_._4.isDefined).map(_._1).toSet // errors always
    // STRICT slowest-prefix: stop at the first query that no longer fits,
    // rather than greedily back-filling faster ones — greedy could include
    // a fast query while omitting a slower one, so a regression in an
    // omitted query could hide behind "n_omitted fast queries". With the
    // strict prefix, every omitted query is no slower than every included
    // one; the file sidecar remains the authoritative full record.
    val bySlowest = results.sortBy(-_._2).map(_._1).filterNot(include.contains)
    val fits = bySlowest.indices.find { i =>
      renderTop(include ++ bySlowest.take(i + 1)).length > 1895
    }.getOrElse(bySlowest.length)
    include ++= bySlowest.take(fits)
    val json = renderTop(include)
    // The file sidecar has no line-length budget: keep FULL 3-decimal
    // precision there (±0.5 ms) so round-over-round comparison is not
    // dominated by the stdout line's 1-decimal quantization.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p => Files.writeString(Paths.get(p), render(3, withSpread = true)))
    println(json)
    spark.stop()
  }
}
