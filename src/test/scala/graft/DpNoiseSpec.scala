package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** The r11 verdict's honesty contract for `q_dp_counts`: the release adds
  * noise whose SHAPE is Binomial(32, ½) centered at 16 (the binomial
  * mechanism's draw), and the seed parameter genuinely rotates the draw —
  * a different (secret) seed yields a different release, which is exactly
  * the knob a private deployment must hold secret. */
class DpNoiseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def noiseSamples(seed: String): Array[Double] = {
    val released = Relational.qDpCounts(spark, TestSpark.sfDir, seed)
    val exact = Tables.customer(spark, TestSpark.sfDir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_exact"))
    released.join(exact, Seq("c_nationkey", "c_mktsegment"))
      .select((col("n_released") - col("n_exact")).cast("double"))
      .collect().map(_.getDouble(0))
  }

  test("per-group noise is Binomial(32, 1/2) - 16: bounded, mean ~0, var ~8") {
    // widen the sample beyond the fixture's ~125 (nation x segment) groups by
    // pooling several seeds — each seed's md5 draws are independent uniform
    // bits, so the pool is still iid Binomial(32, 1/2) - 16
    val xs = Seq("dp:", "s1:", "s2:", "s3:").flatMap(noiseSamples)
    assert(xs.nonEmpty)
    assert(xs.forall(x => x >= -16 && x <= 16),
      "binomial(32) noise centered at 16 is bounded to [-16, 16]")
    val n = xs.length
    val mean = xs.sum / n
    val varr = xs.map(x => (x - mean) * (x - mean)).sum / n
    // std of the sample mean is sqrt(8/n) (~0.13 at n~500): 4 sigma bound
    assert(math.abs(mean) < 4.0 * math.sqrt(8.0 / n),
      s"sample mean $mean too far from 0 for n=$n")
    // Binomial(32,.5) variance is 8; allow a wide but diagnostic band
    assert(varr > 5.0 && varr < 11.5, s"sample variance $varr outside [5, 11.5]")
  }

  test("the seed parameter rotates the draw: different seeds, different release") {
    val a = noiseSamples("dp:").toSeq
    val b = noiseSamples("secret-2026-08:").toSeq
    assert(a.length === b.length)
    assert(a !== b, "a fresh seed must produce a fresh noise vector")
  }

  private def noiseByGroup(seed: String): Map[(Int, String), Double] = {
    val released = Relational.qDpCounts(spark, TestSpark.sfDir, seed)
    val exact = Tables.customer(spark, TestSpark.sfDir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_exact"))
    released.join(exact, Seq("c_nationkey", "c_mktsegment"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        (col("n_released") - col("n_exact")).cast("double"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2))
      .toMap
  }

  test("seed/key boundary is delimited: seed 'a' at key 12 and seed 'a1' at key 2 draw independently") {
    // WITHOUT the delimiter, 'a' ++ '12:SEG' and 'a1' ++ '2:SEG' hash the
    // same bytes — nation 12 under seed 'a' would silently reuse nation 2's
    // noise under the rotated seed 'a1' for every segment
    val a = noiseByGroup("a")
    val a1 = noiseByGroup("a1")
    val segs = a.keySet.collect { case (12, s) => s }
      .intersect(a1.keySet.collect { case (2, s) => s })
    assert(segs.nonEmpty, "fixture must carry nations 12 and 2")
    assert(segs.exists(s => a((12, s)) != a1((2, s))),
      "an undelimited seed concat aliases (seed a, nation 12) with " +
        "(seed a1, nation 2) — their draws must be independent")
  }
}
