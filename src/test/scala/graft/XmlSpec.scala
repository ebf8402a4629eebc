package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.XmlSource

/** CustomerMgmt.xml-shaped ingest (FIXTURES.md §B): nested action elements
  * with attributes, struct extraction, and the phone-assembly transform
  * (country/area/local parts concatenated — the DimCustomer phone rule). */
class XmlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val xml =
    """<TPCDI:Actions xmlns:TPCDI="http://www.tpc.org/tpc-di">
      |  <TPCDI:Action ActionType="NEW" ActionTS="2007-01-02T00:00:01">
      |    <Customer C_ID="42" C_TIER="2" C_DOB="1971-05-06">
      |      <Name><C_L_NAME>Smith</C_L_NAME><C_F_NAME>Ann</C_F_NAME></Name>
      |      <ContactInfo>
      |        <C_PHONE_1><C_CTRY_CODE>1</C_CTRY_CODE><C_AREA_CODE>612</C_AREA_CODE><C_LOCAL>555-0100</C_LOCAL></C_PHONE_1>
      |        <C_PRIM_EMAIL>ann@example.com</C_PRIM_EMAIL>
      |      </ContactInfo>
      |    </Customer>
      |  </TPCDI:Action>
      |  <TPCDI:Action ActionType="UPDCUST" ActionTS="2010-03-14T00:00:01">
      |    <Customer C_ID="42" C_TIER="3"/>
      |  </TPCDI:Action>
      |  <TPCDI:Action ActionType="INACT" ActionTS="2012-06-01T00:00:01">
      |    <Customer C_ID="43"/>
      |  </TPCDI:Action>
      |</TPCDI:Actions>""".stripMargin

  test("nested CustomerMgmt actions parse with attributes and structs") {
    val tmp = Files.createTempDirectory("graft_xml").resolve("customer_mgmt.xml")
    Files.write(tmp, xml.getBytes)
    val df = XmlSource.read(spark, tmp.toString, rowTag = "TPCDI:Action")

    val rows = df
      .select(
        col("_ActionType").as("action"),
        col("Customer._C_ID").cast("long").as("c_id"),
        col("Customer._C_TIER").cast("int").as("tier"),
        col("Customer.Name.C_L_NAME").as("l_name"),
        // phone assembly from nested parts — the DimCustomer phone transform
        concat_ws("-",
          col("Customer.ContactInfo.C_PHONE_1.C_CTRY_CODE").cast("string"),
          col("Customer.ContactInfo.C_PHONE_1.C_AREA_CODE").cast("string"),
          col("Customer.ContactInfo.C_PHONE_1.C_LOCAL")).as("phone"))
      .orderBy("action")
      .collect()

    assert(rows.length === 3)
    val byAction = rows.map(r => r.getString(0) -> r).toMap
    assert(byAction("NEW").getLong(1) === 42L)
    assert(byAction("NEW").getInt(2) === 2)
    assert(byAction("NEW").getString(3) === "Smith")
    assert(byAction("NEW").getString(4) === "1-612-555-0100")
    assert(byAction("UPDCUST").getInt(2) === 3)
    assert(byAction("UPDCUST").isNullAt(3)) // no Name element on the update
    assert(byAction("INACT").getLong(1) === 43L)
  }
}
