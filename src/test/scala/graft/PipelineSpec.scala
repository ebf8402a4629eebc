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

  // ---- full FINWIRE slice: CMP + SEC + FIN through one multi-type file ----
  //            PTS(8)      TYP(3)  then per-type payload
  // CMP: CIK(10) STATUS(4) NAME(20)
  // SEC: SYMBOL(6) CoNameOrCIK(20)   [numeric → CIK, else company name]
  // FIN: CIK(10) QTR(1) REVENUE(10)
  private def pad(s: String, n: Int) = s.padTo(n, ' ')
  private val finwireFull = Seq(
    "20070102CMP" + "0000001111" + "ACTV" + pad("AlphaCorp", 20),
    "20080101CMP" + "0000001111" + "INAC" + pad("AlphaCorp", 20), // v2: status change
    "20070102CMP" + "0000002222" + "ACTV" + pad("Beta LLC", 20),
    "20070103SEC" + pad("ALP", 6) + pad("1111", 20),              // by-CIK dispatch
    "20070103SEC" + pad("BET", 6) + pad("Beta LLC", 20),          // by-name dispatch
    "20070601FIN" + "0000001111" + "2" + pad("1000.50", 10),      // inside ACTV v1
    "20080601FIN" + "0000001111" + "2" + pad("2000.75", 10))      // inside INAC v2

  private val fullLayouts = Map(
    "CMP" -> Seq(FieldSpec("pts", 1, 8), FieldSpec("cik", 12, 10, LongType),
                 FieldSpec("status", 22, 4), FieldSpec("co_name", 26, 20)),
    "SEC" -> Seq(FieldSpec("pts", 1, 8), FieldSpec("symbol", 12, 6),
                 FieldSpec("co_name_or_cik", 18, 20)),
    "FIN" -> Seq(FieldSpec("pts", 1, 8), FieldSpec("cik", 12, 10, LongType),
                 FieldSpec("qtr", 22, 1, IntegerType),
                 FieldSpec("revenue", 23, 10, DoubleType)))

  test("FINWIRE CMP/SEC/FIN end-to-end: SCD2 dim + CoNameOrCIK dispatch + point-in-time FIN") {
    val tmp = Files.createTempDirectory("graft_finwire").resolve("finwire.txt")
    Files.write(tmp, finwireFull.mkString("\n").getBytes)
    val recs = FixedWidthSource.readTyped(spark, tmp.toString, 9, 3, fullLayouts)

    // DimCompany: SCD2 history keyed by CIK from the CMP change log
    val dim = Scd2.fromChangeLog(
      recs("CMP").withColumn("eff", to_date(col("pts"), "yyyyMMdd"))
        .select("cik", "status", "co_name", "eff"),
      Seq("cik"), "eff")

    // DimSecurity: each SEC row resolves its company via the CoNameOrCIK
    // conditional key — numeric → CIK branch, else name branch, both equi
    // (the qJoinConditionalKey pattern), point-in-time at the SEC PTS.
    val sec = recs("SEC").withColumn("sec_date", to_date(col("pts"), "yyyyMMdd"))
    def pit(f: org.apache.spark.sql.DataFrame) = f("sec_date") >= dim("eff") &&
      (dim("end").isNull || f("sec_date") < dim("end"))
    val byCik = sec.filter(col("co_name_or_cik").rlike("^[0-9]+$"))
    val byName = sec.filter(!col("co_name_or_cik").rlike("^[0-9]+$"))
    val secResolved =
      byCik.join(dim, byCik("co_name_or_cik").cast("long") === dim("cik") && pit(byCik))
        .unionByName(byName.join(dim, byName("co_name_or_cik") === dim("co_name") && pit(byName)))
        .select(col("symbol"), col("cik"), col("status"))
        .orderBy("symbol").collect()
    assert(secResolved.map(r => (r.getString(0).trim, r.getLong(1), r.getString(2))).toSeq ===
      Seq(("ALP", 1111L, "ACTV"), ("BET", 2222L, "ACTV")),
      "SEC rows must resolve through both dispatch branches to the version at PTS")

    // Financial: FIN rows join the company version current at filing time
    val fin = recs("FIN").withColumn("fin_date", to_date(col("pts"), "yyyyMMdd"))
    val finResolved = Scd2.resolve(fin, dim, "cik", "cik", "fin_date", "eff", "end")
      .select(fin("cik"), col("fin_date"), col("status"), col("revenue"))
      .orderBy("fin_date").collect()
    assert(finResolved.length === 2, "every FIN row resolves exactly once")
    assert(finResolved.map(_.getString(2)).toSeq === Seq("ACTV", "INAC"),
      "FIN rows must land in the version effective at their filing date")
    assert(finResolved.map(_.getDouble(3)).toSeq === Seq(1000.50, 2000.75))
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
