package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{FixedWidthSource, Scd2, XmlSource}
import graft.etl.FixedWidthSource.FieldSpec

/** End-to-end TPC-DI-shaped slice: FINWIRE fixed-width CMP records →
  * SCD2 company dimension (Scd2.fromChangeLog) → point-in-time fact resolve
  * (Scd2.resolve) — the DimCompany → Financial surrogate-key flow, wired
  * through the same etl pieces a full historical load would use. */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  //            PTS(8=yyyymmdd)  TYP(3)  CIK(10)     STATUS(4)
  private val finwire = Seq(
    "20070102" + "CMP" + "0000001234" + "ACTV",
    "20080601" + "CMP" + "0000001234" + "INAC", // status change → new version
    "20090301" + "CMP" + "0000001234" + "ACTV", // reactivated
    "20070102" + "CMP" + "0000005678" + "ACTV")

  private val cmpLayout = Map("CMP" -> Seq(
    FieldSpec("pts", 1, 8), FieldSpec("cik", 12, 10, LongType),
    FieldSpec("status", 22, 4)))

  test("FINWIRE -> SCD2 dimension -> point-in-time fact resolve") {
    val tmp = Files.createTempDirectory("graft_pipe").resolve("finwire.txt")
    Files.write(tmp, finwire.mkString("\n").getBytes)

    // ingest: fixed-width slice, PTS to a date-typed effective-from
    val cmp = FixedWidthSource
      .readTyped(spark, tmp.toString, 9, 3, cmpLayout)("CMP")
      .withColumn("eff", to_date(col("pts"), "yyyyMMdd"))
      .select("cik", "status", "eff")

    // dimension: SCD2 history keyed by CIK
    val dim = Scd2.fromChangeLog(cmp, Seq("cik"), "eff")
    val hist = dim.orderBy("cik", "eff").collect()
    assert(hist.length === 4)
    assert(hist.count(_.getAs[Boolean]("is_current")) === 2) // one open row per CIK

    // facts: (cik, trade date) resolve the version current at trade time
    import spark.implicits._
    val facts = Seq(
      (1234L, "2007-06-01"), // inside ACTV v1
      (1234L, "2008-06-01"), // exactly on the INAC effective date
      (1234L, "2010-01-01"), // open-ended ACTV v3
      (5678L, "2020-01-01")) // single open version
      .toDF("f_cik", "d")
      .withColumn("trade_date", to_date(col("d")))

    val resolved = Scd2.resolve(facts, dim, "f_cik", "cik", "trade_date")
      .select(col("f_cik"), col("trade_date"), col("status"), col("eff"))
      .orderBy("f_cik", "trade_date")
      .collect()

    assert(resolved.length === 4) // every fact resolved exactly once
    assert(resolved.map(_.getString(2)).toSeq === Seq("ACTV", "INAC", "ACTV", "ACTV"))
    // the fact dated exactly on a version boundary lands in the NEW version
    assert(resolved(1).getDate(3).toString === "2008-06-01")
  }

  private val customerMgmtXml =
    """<TPCDI:Actions xmlns:TPCDI="http://www.tpc.org/tpc-di">
      |  <TPCDI:Action ActionType="NEW" ActionTS="2007-01-02T00:00:01">
      |    <Customer C_ID="42" C_TIER="2"/>
      |  </TPCDI:Action>
      |  <TPCDI:Action ActionType="UPDCUST" ActionTS="2010-03-14T00:00:01">
      |    <Customer C_ID="42" C_TIER="3"/>
      |  </TPCDI:Action>
      |  <TPCDI:Action ActionType="NEW" ActionTS="2008-05-01T00:00:01">
      |    <Customer C_ID="43" C_TIER="1"/>
      |  </TPCDI:Action>
      |</TPCDI:Actions>""".stripMargin

  test("CustomerMgmt.xml action log -> SCD2 customer dimension (historical load)") {
    val tmp = Files.createTempDirectory("graft_pipe_xml").resolve("customer_mgmt.xml")
    Files.write(tmp, customerMgmtXml.getBytes)

    val log = XmlSource.read(spark, tmp.toString, rowTag = "TPCDI:Action")
      .select(
        col("Customer._C_ID").cast("long").as("c_id"),
        col("Customer._C_TIER").cast("int").as("tier"),
        to_timestamp(col("_ActionTS")).as("eff"))

    val dim = Scd2.fromChangeLog(log, Seq("c_id"), "eff")
    val hist = dim.orderBy("c_id", "eff").collect()
    assert(hist.length === 3)

    // customer 42 has two versions: the NEW row end-dated by the UPDCUST row
    val c42 = hist.filter(_.getAs[Long]("c_id") == 42L)
    assert(c42.map(_.getAs[Int]("tier")).toSeq === Seq(2, 3))
    assert(!c42(0).getAs[Boolean]("is_current") && c42(1).getAs[Boolean]("is_current"))
    assert(c42(0).getAs[Timestamp]("end") === c42(1).getAs[Timestamp]("eff"))

    // customer 43 has its single NEW version open-ended
    val c43 = hist.filter(_.getAs[Long]("c_id") == 43L)
    assert(c43.length === 1 && c43(0).getAs[Boolean]("is_current"))
  }
}
