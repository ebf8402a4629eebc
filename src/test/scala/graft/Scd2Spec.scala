package graft

import org.scalacheck.{Gen, Properties, Test => ScTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Scd2

/** Deterministic SCD2 checks + scalacheck invariants (SURVEY.md §5.2 layer 3):
  * for any change log, the generated version intervals partition time per key
  * (end == next eff, exactly one open row), and CDC application matches a
  * pure-Scala reference implementation. */
class Scd2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("fromChangeLog end-dates each version with the next effective date") {
    val log = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("k", "eff")
    val hist = Scd2.fromChangeLog(log, Seq("k"), "eff")
      .orderBy("k", "eff").collect()
    assert(hist.map(r => (r.getInt(0), r.getInt(1), Option(r.get(2)), r.getBoolean(3))).toSeq ===
      Seq((1, 10, Some(20), false), (1, 20, Some(30), false),
          (1, 30, None, true), (2, 5, None, true)))
  }

  test("applyCdcHistorized: updates version, deletes close, history never rewritten") {
    // history for keys 1 (two versions) and 2 (one version) via fromChangeLog
    val hist = Scd2.fromChangeLog(
      Seq((1, 10, "a1"), (1, 20, "a2"), (2, 5, "b1")).toDF("k", "eff", "attr"),
      Seq("k"), "eff")
    // batch at eff=30: update key 1 (two records — seq 12 wins), delete key 2,
    // insert key 3
    val cdc = Seq(
      ("U", 11L, 1, 30, "a3-lost"),
      ("U", 12L, 1, 30, "a3"),
      ("D", 13L, 2, 30, ""),
      ("I", 14L, 3, 30, "c1"))
      .toDF("flag", "seq", "k", "eff", "attr")
    val next = Scd2.applyCdcHistorized(hist, cdc, Seq("k"), "seq", "flag")
      .orderBy("k", "eff").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("eff"),
                 Option(r.getAs[Any]("end")).map(_.asInstanceOf[Int]),
                 r.getAs[Boolean]("is_current"), r.getAs[String]("attr")))

    assert(next.toSeq === Seq(
      (1, 10, Some(20), false, "a1"),   // closed history untouched
      (1, 20, Some(30), false, "a2"),   // open version end-dated at batch eff
      (1, 30, None, true, "a3"),        // latest batch record wins the new version
      (2, 5, Some(30), false, "b1"),    // delete closes, no successor
      (3, 30, None, true, "c1")))       // insert opens a first version

    // invariants: at most one current version per key; deleted key has none
    val currents = next.filter(_._4).groupBy(_._1).view.mapValues(_.length).toMap
    assert(currents === Map(1 -> 1, 3 -> 1))
  }

  test("resolve lands every fact in exactly one version") {
    val dim = Scd2.fromChangeLog(
      Seq((1, 10), (1, 20), (2, 5)).toDF("k", "eff"), Seq("k"), "eff")
    val facts = Seq((1, 10), (1, 15), (1, 25), (2, 99)).toDF("fk", "t")
    val resolved = Scd2.resolve(facts, dim, "fk", "k", "t").collect()
    assert(resolved.length === 4) // one version per fact, none dropped
    val eff = resolved.map(r => (r.getAs[Int]("t"), r.getAs[Int]("eff"))).toMap
    assert(eff === Map(10 -> 10, 15 -> 10, 25 -> 20, 99 -> 5))
  }
}

/** scalacheck invariants, run by sbt's native ScalaCheck framework. Few
  * cases (each spawns Spark jobs) but fully generative. */
object Scd2Props extends Properties("Scd2") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(0x5EED5CD2L)) // reproducible-by-artifact

  private val genLog: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(1, 20)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 4), Gen.choose(0, 50)))
  } yield rows.distinct

  property("intervals tile time; exactly one current version per key") =
    forAll(genLog) { rows =>
      import spark.implicits._
      val hist = Scd2.fromChangeLog(rows.toDF("k", "eff"), Seq("k"), "eff")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Int]),
                   r.getBoolean(3)))
        .groupBy(_._1)
      hist.forall { case (_, versions) =>
        val sorted = versions.sortBy(_._2)
        val tiled = sorted.sliding(2).forall {
          case Array((_, _, end, _), (_, effNext, _, _)) => end.contains(effNext)
          case _ => true
        }
        tiled && sorted.init.forall(!_._4) && sorted.last._4 && sorted.last._3.isEmpty
      }
    }

  private val genSnapshot: Gen[List[(Int, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(1, 8), Gen.identifier.map(_.take(4))))
      .map(_.distinctBy(_._1))

  private val genCdc: Gen[List[(String, Int, Int, String)]] = for {
    n <- Gen.choose(0, 15)
    rows <- Gen.listOfN(n, for {
      flag <- Gen.oneOf("I", "U", "D")
      k <- Gen.choose(1, 8)
      v <- Gen.identifier.map(_.take(4))
    } yield (flag, k, v))
  } yield rows.zipWithIndex.map { case ((f, k, v), seq) => (f, seq, k, v) }

  property("applyCdc matches the reference latest-wins/delete semantics") =
    forAll(genSnapshot, genCdc) { (snap, cdc) =>
      import spark.implicits._
      val snapDf = snap.toDF("k", "v")
      val cdcDf = cdc.toDF("flag", "seq", "k", "v")
      val got = Scd2.applyCdc(snapDf, cdcDf, Seq("k"), "seq", "flag")
        .collect().map(r => (r.getAs[Int]("k"), r.getAs[String]("v"))).toSet
      // reference: latest cdc per key wins; D deletes; untouched keys survive
      val latest = cdc.groupBy(_._3).map { case (k, rs) => k -> rs.maxBy(_._2) }
      val expected = (snap.filterNot(s => latest.contains(s._1)) ++
        latest.values.collect { case (f, _, k, v) if f != "D" => (k, v) }).toSet
      got == expected
    }
}
