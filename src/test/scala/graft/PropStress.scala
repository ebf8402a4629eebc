package graft

/** Ad-hoc stress driver for the property suites: run every ScalaCheck
  * property at an elevated trial count with an UNPINNED seed (the pinned
  * suite run explores one deterministic path; this explores the tail).
  * `sbt "Test/runMain graft.PropStress [n]"` — exits non-zero on any
  * falsification. The r12 verdict's done-criterion for the Pca fix is
  * this run at n ≥ 1000. */
object PropStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    // pure-Scala suites take the full count; the Spark-backed suites run a
    // job per trial, so they stress at a bounded fraction
    val suites: Seq[(String, org.scalacheck.Properties, Int)] = Seq(
      ("PrimitiveProps", PrimitiveProps, n),
      ("MisraGriesProps", MisraGriesProps, n),
      ("TopKProps", TopKProps, math.min(n, 40)),
      ("Scd2Props", Scd2Props, math.min(n, 40)))
    var failed = 0
    for ((sn, suite, cnt) <- suites; (pn, prop) <- suite.properties) {
      val params = org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(cnt)
      val r = org.scalacheck.Test.check(params, prop)
      println(s"STRESS[$cnt] $sn/$pn -> ${if (r.passed) "OK" else s"FALSIFIED: ${r.status}"}")
      if (!r.passed) failed += 1
    }
    if (failed > 0) sys.exit(1)
  }
}
