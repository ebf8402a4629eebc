package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.WarehouseEtl

/** Contracts of the composed TPC-DI load ([[graft.etl.WarehouseEtl]]) that
  * the DuckDB oracle cannot see: the write-once extract protocol and the
  * funnel's internal consistency. The stage VALUES themselves are oracled
  * (`q_warehouse_etl` restates the funnel over the original parquet). */
class WarehouseEtlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("funnel is internally consistent and extracts are write-once") {
    val r1 = WarehouseEtl.qWarehouseEtl(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

    // reject channels split their source exactly
    assert(r1("dim_customer") ===
      r1("src_customer_lines") - r1("customer_rejects"))
    assert(r1("src_finwire_lines") ===
      r1("dim_supplier") + r1("finwire_cmp_rejects") +
        r1("dim_part") + r1("finwire_unknown"))
    // every customer with orders has exactly one OPEN version
    assert(r1("dim_customer_versions_open") <= r1("xml_actions"))
    // the fact funnel narrows monotonically
    assert(r1("fact_resolved") <= r1("fact_input"))
    assert(r1("fact_loaded") <= r1("fact_resolved"))
    assert(r1("fact_loaded") > 0, "the load must actually land rows")

    // second run: identical report, extracts NOT rewritten (the _READY
    // marker short-circuits serialization — fingerprint-keyed write-once)
    val extRoot = Paths.get(sys.props("java.io.tmpdir"), "graft-wh")
    import scala.jdk.CollectionConverters._
    def readyMtimes(): Map[String, Long] = {
      val s = Files.walk(extRoot)
      try s.iterator().asScala
        .filter(_.getFileName.toString == "_READY")
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    val before = readyMtimes()
    assert(before.nonEmpty, "first run must have produced a ready extract")
    val r2 = WarehouseEtl.qWarehouseEtl(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(r2 === r1, "re-running the load must reproduce the report")
    assert(readyMtimes() === before,
      "a second run must reuse the fingerprinted extracts, not rewrite them")
  }
}
