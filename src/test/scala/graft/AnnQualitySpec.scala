package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.AnnQuality

/** The unified ANN quality gate: ONE scoring pass over the shared planted
  * fixture ([[AnnQuality.plantedCorpus]]) scores all ten paths, and every
  * path must clear its floor in [[AnnQuality.minRecall]] — the same run
  * that renders ANN_REPORT.md (graft.AnnReport), so the committed table
  * and the enforced thresholds can never drift apart. */
class AnnQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("all ten ANN paths clear their recall floors on the shared fixture") {
    val scores = AnnQuality.score(spark)
    assert(scores.map(_.path).toSet === AnnQuality.minRecall.keySet,
      "every declared path must be scored, and only declared paths")
    scores.foreach { s =>
      val floorPerProbe = AnnQuality.minRecall(s.path)
      val floor = floorPerProbe * s.probes
      assert(s.hits >= floor,
        s"${s.path}: recall ${s.hits}/${s.exactTotal} below floor $floor")
      // sub-corpus candidate sets: the pruned paths must stay sublinear
      if (Set("lsh", "ivf", "ivfpq").exists(s.path.startsWith))
        assert(s.coarseRows < AnnQuality.CorpusRows / 2,
          s"${s.path}: coarse stage reads ${s.coarseRows} of " +
            s"${AnnQuality.CorpusRows} rows — not a pruned scan")
    }
  }
}
