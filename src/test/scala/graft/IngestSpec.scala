package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DelimitedSource, FixedWidthSource}
import graft.etl.FixedWidthSource.FieldSpec

/** Text ingest (SURVEY.md §2.1 no-oracle rows `q_scan_csv` /
  * `q_scan_fixedwidth`): TPC-DI sources are header-less pipe-delimited and
  * fixed-width text — prove both read paths against round-trip equality and
  * synthetic FINWIRE lines (FIXTURES.md §B). */
class IngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("JSON-lines source round-trips with an explicit schema") {
    // Schema given explicitly (never inferred — an inference scan is a
    // second full read and type drift at 100 TB); timestamps excluded from
    // the fixture since JSON carries no native timestamp type.
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val tmp = Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(tmp)
    val back = spark.read.schema(docs.schema).json(tmp)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("json reject capture: malformed lines land in _reject, good rows load clean") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
    val schema = new StructType()
      .add("id", IntegerType).add("name", StringType)
    val tmp = Files.createTempDirectory("graft_json_rej").toString
    Files.write(java.nio.file.Paths.get(tmp, "part-0.json"), java.util.List.of(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2 "name": "missing-comma"}""", // malformed JSON
      """{"id": "notanint", "name": "bad-type"}""", // schema violation
      """{"id": 3, "name": "fine"}"""))
    // Spark disallows queries whose referenced columns are ONLY the
    // corrupt-record column of a raw JSON scan — materialize first (the
    // production path writes clean/reject tables, which reads every column)
    val rows = graft.etl.JsonSource.readWithRejects(spark, tmp, schema).cache()
    rows.count()
    val clean = rows.filter(col("_reject").isNull)
    val rejects = rows.filter(col("_reject").isNotNull)
    assert(clean.count() === 2, "exactly the two well-formed records load")
    assert(clean.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    assert(rejects.count() === 2, "both malformed lines are captured, not dropped")
    // the reject channel carries the raw line for the error table
    assert(rejects.collect().forall(_.getAs[String]("_reject").nonEmpty))
  }

  test("ORC source/sink round-trips the columnar tables") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val tmp = Files.createTempDirectory("graft_orc").toString
    li.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.schema === li.schema)
    assert(back.exceptAll(li).count() === 0)
    assert(li.exceptAll(back).count() === 0)
    // pushdown reaches the ORC scan too, same as parquet
    val plan = back.filter(org.apache.spark.sql.functions.col("l_quantity") > 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"no pushdown into the ORC scan:\n$plan")
  }

  test("Avro source/sink: the full flat type surface round-trips, nulls included") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = new StructType()
      .add("b", BooleanType).add("i", IntegerType, nullable = true)
      .add("l", LongType).add("f", FloatType).add("d", DoubleType)
      .add("s", StringType, nullable = true).add("bin", BinaryType)
    val rows = Seq(
      Row(true, 1, 10L, 1.5f, 2.5, "alpha", Array[Byte](1, 2, 3)),
      Row(false, null, -7L, -0.25f, 1e9, null, Array[Byte]()),
      Row(true, 42, Long.MaxValue, Float.MinPositiveValue, -3.25, "δ utf8", Array[Byte](-1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = Files.createTempDirectory("graft_avro").toString
    val nFiles = graft.etl.AvroSource.writeAvro(df, tmp)
    assert(nFiles >= 1 && nFiles <= 2)
    val back = graft.etl.AvroSource.readAvro(spark, tmp)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    def canon(r: Row) = (r.getBoolean(0), Option(r.get(1)), r.getLong(2),
      r.getFloat(3), r.getDouble(4), Option(r.get(5)),
      r.getAs[Array[Byte]](6).toSeq)
    assert(back.collect().map(canon).sortBy(_._3).toSeq ===
      rows.map(canon).sortBy(_._3).toSeq)
  }

  test("Avro source/sink: a warehouse table round-trips; one task per container file") {
    import org.apache.spark.sql.functions.col
    val cust = Tables.customer(spark, TestSpark.sfDir)
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("c_acctbal"),
        col("c_mktsegment"))
    val tmp = Files.createTempDirectory("graft_avro_cust").toString
    val nFiles = graft.etl.AvroSource.writeAvro(cust.repartition(3), tmp)
    assert(nFiles === 3, "one container file per partition")
    val back = graft.etl.AvroSource.readAvro(spark, tmp)
    assert(back.rdd.getNumPartitions === 3, "one scan task per container file")
    assert(back.count() === cust.count())
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)
  }

  test("Avro logical types: orders/lineitem dates, timestamps and decimals round-trip bit-exactly") {
    import org.apache.spark.sql.functions.col
    // the TPC-DI-shaped columns the flat subset could not carry before:
    // date (int+date), timestamp (long+timestamp-micros), decimal(p,s)
    // (bytes+decimal) — schema equality and bit-exact values both ways
    val ord = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"),
        col("o_orderdate").as("o_ts"),
        col("o_orderdate").cast("date").as("o_date"),
        col("o_totalprice").cast("decimal(12,2)").as("o_price"))
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("l_date"),
        col("l_extendedprice").cast("decimal(15,2)").as("l_price"),
        col("l_discount").cast("decimal(4,3)").as("l_disc"))
    for ((df, name) <- Seq((ord, "orders"), (li, "lineitem"))) {
      val tmp = Files.createTempDirectory(s"graft_avro_lt_$name").toString
      graft.etl.AvroSource.writeAvro(df.repartition(2), tmp)
      val back = graft.etl.AvroSource.readAvro(spark, tmp)
      assert(back.schema === df.schema,
        s"$name: logical types must round-trip to the exact Spark schema, " +
          s"got ${back.schema.treeString} vs ${df.schema.treeString}")
      assert(back.count() === df.count())
      assert(back.exceptAll(df).count() === 0, s"$name: rows diverged on read-back")
      assert(df.exceptAll(back).count() === 0, s"$name: rows lost on read-back")
    }
  }

  test("Avro logical types follow the session's java8API setting on read") {
    import org.apache.spark.sql.functions.col
    val df = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("o_ts"),
        col("o_orderdate").cast("date").as("o_date"))
      .orderBy("o_orderkey").limit(10)
    val expected = df.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).toInstant, r.getDate(2).toLocalDate))
    val tmp = Files.createTempDirectory("graft_avro_j8").toString
    graft.etl.AvroSource.writeAvro(df, tmp)
    val key = "spark.sql.datetime.java8API.enabled"
    spark.conf.set(key, "true")
    try {
      // with the java8 API on, createDataFrame validates external types as
      // java.time — a reader emitting java.sql types would fail every task
      val back = graft.etl.AvroSource.readAvro(spark, tmp)
        .orderBy("o_orderkey").collect()
      assert(back.length === 10)
      assert(back.head.get(1).isInstanceOf[java.time.Instant])
      assert(back.head.get(2).isInstanceOf[java.time.LocalDate])
      val got = back.map(r => (r.getLong(0),
        r.getAs[java.time.Instant](1), r.getAs[java.time.LocalDate](2)))
      assert(got.toSeq === expected.toSeq,
        "values must be identical across the two datetime APIs")
    } finally spark.conf.set(key, "false")
  }

  test("Avro sink: a rewrite with fewer partitions clears stale part files (overwrite semantics)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_avro_ow").toString
    val first = (0L until 30L).map(i => (i, s"v$i")).toDF("id", "v")
    assert(graft.etl.AvroSource.writeAvro(first.repartition(3), tmp) === 3)
    val second = Seq((100L, "only")).toDF("id", "v")
    assert(graft.etl.AvroSource.writeAvro(second.coalesce(1), tmp) === 1)
    val back = graft.etl.AvroSource.readAvro(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back === Seq((100L, "only")),
      s"stale part files from the wider first write must not survive, got $back")
  }

  test("Avro source: unsupported and mixed schemas fail loudly, not silently") {
    import org.apache.spark.sql.types._
    // unsupported Spark type on write (timestamps/dates/decimals are now
    // carried as logical types — nested types remain out of scope)
    val err = intercept[IllegalArgumentException] {
      graft.etl.AvroSource.toAvroSchema(
        new StructType().add("arr", ArrayType(IntegerType)), "r")
    }
    assert(err.getMessage.contains("unsupported") && err.getMessage.contains("arr"))
    // mixed-schema directory on read
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, 3.0)).toDF("id", "w")
    val tmp = Files.createTempDirectory("graft_avro_mixed").toString
    graft.etl.AvroSource.writeAvro(a.coalesce(1), s"$tmp/a")
    graft.etl.AvroSource.writeAvro(b.coalesce(1), s"$tmp/b")
    val mixed = intercept[org.apache.spark.SparkException] {
      graft.etl.AvroSource.readAvro(spark, tmp).collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(mixed).contains("different schema"),
      s"mixed-schema read must fail with the explicit message, got: ${msgs(mixed)}")
  }

  test("Avro superset read: files storing a subset of the declared schema read with nulls; violations fail loudly") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_avro_super").toString
    // two generations of one logical table: the old one predates 'score'
    graft.etl.AvroSource.writeAvro(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), s"$tmp/old")
    graft.etl.AvroSource.writeAvro(
      Seq((3L, "c", 42.0)).toDF("id", "v", "score").coalesce(1), s"$tmp/new")
    val declared = new StructType()
      .add("id", LongType, nullable = false)
      .add("v", StringType).add("score", DoubleType)
    // each generation reads under the declared superset — absent field null
    val old = graft.etl.AvroSource.readAvro(spark, s"$tmp/old", declared)
    assert(old.schema === declared)
    assert(old.collect().map(r =>
      (r.getLong(0), r.getString(1), r.isNullAt(2))).sorted.toSeq ===
      Seq((1L, "a", true), (2L, "b", true)))
    val nw = graft.etl.AvroSource.readAvro(spark, s"$tmp/new", declared)
    assert(nw.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((3L, "c", 42.0)))
    // and the two generations coexist in ONE directory read (the
    // pre-evolution-next-to-post-evolution layout the strict reader rejects)
    val both = graft.etl.AvroSource.readAvro(spark, tmp, declared)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sorted.toSeq
    assert(both === Seq((1L, "a", -1.0), (2L, "b", -1.0), (3L, "c", 42.0)))
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    // a stored field the declared schema does not cover is data loss: loud
    val uncovered = intercept[org.apache.spark.SparkException] {
      graft.etl.AvroSource.readAvro(spark, s"$tmp/new",
        new StructType().add("id", LongType).add("v", StringType)).collect()
    }
    assert(msgs(uncovered).contains("does not cover"))
    // a type change is not an add-column evolution: loud
    val retyped = intercept[org.apache.spark.SparkException] {
      graft.etl.AvroSource.readAvro(spark, s"$tmp/new", new StructType()
        .add("id", LongType).add("v", StringType).add("score", LongType))
        .collect()
    }
    assert(msgs(retyped).contains("type changes"))
    // an absent field must be nullable (defaulting is the table layer's job)
    val nonNull = intercept[org.apache.spark.SparkException] {
      graft.etl.AvroSource.readAvro(spark, s"$tmp/old", new StructType()
        .add("id", LongType).add("v", StringType)
        .add("score", DoubleType, nullable = false)).collect()
    }
    assert(msgs(nonNull).contains("non-nullable"))
  }

  test("Avro projected read: non-projected fields are resolver-skipped at decode, not decoded-and-dropped (r17 judge #6)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_avro_proj").toString
    // a WIDE file: a fat payload column next to two narrow ones
    val df = (1L to 200L).map(i =>
        (i, "x" * 500, s"t$i", i.toDouble)).toDF("id", "payload", "tag", "score")
    graft.etl.AvroSource.writeAvro(df.coalesce(1), tmp)
    // correctness: narrow read returns exactly the projected columns, in
    // projection order, values intact
    val narrow = graft.etl.AvroSource
      .readAvroProjected(spark, tmp, Seq("score", "id"))
    assert(narrow.columns.toSeq === Seq("score", "id"))
    assert(narrow.collect().map(r => (r.getDouble(0), r.getLong(1))).sorted.toSeq
      === (1L to 200L).map(i => (i.toDouble, i)).sorted)
    // the skip is REAL: count string cells materialized by the decode path.
    // A decode-and-drop implementation would materialize 200 payload + 200
    // tag strings; the reader-schema skip materializes ZERO for a
    // string-free projection and exactly 200 when one string column is
    // projected back in.
    val ctr = graft.etl.AvroSource.stringDecodeCount
    graft.etl.AvroSource.stringDecodeProbeOn = true
    try {
      ctr.set(0L)
      graft.etl.AvroSource.readAvroProjected(spark, tmp, Seq("id", "score"))
        .collect()
      assert(ctr.get === 0L,
        s"string-free projection must materialize zero strings, got ${ctr.get}")
      ctr.set(0L)
      graft.etl.AvroSource.readAvroProjected(spark, tmp, Seq("id", "tag"))
        .collect()
      assert(ctr.get === 200L,
        s"projecting one string column must materialize exactly its 200 " +
          s"cells (payload skipped), got ${ctr.get}")
      ctr.set(0L)
      graft.etl.AvroSource.readAvro(spark, tmp).collect()
      assert(ctr.get === 400L,
        s"the unprojected read decodes all 400 string cells, got ${ctr.get}")
    } finally graft.etl.AvroSource.stringDecodeProbeOn = false
    // evolution coexistence: a file PREDATING a projected column reads null,
    // and (r18, ADVICE r17) the projection resolves against the UNION of
    // file schemas, so listing order cannot matter: name the dirs so the
    // LEGACY file sorts FIRST ("a_old" < "b_new") — the pre-r18 first-file
    // resolution would throw "not in the table schema" on exactly this
    // layout — and the projected field must come back NULLABLE (any file
    // may predate it; a non-null claim would lie to downstream codegen)
    val tmp2 = Files.createTempDirectory("graft_avro_proj2").toString
    graft.etl.AvroSource.writeAvro(
      Seq((999L, 9.9)).toDF("id", "score").coalesce(1), s"$tmp2/a_old")
    graft.etl.AvroSource.writeAvro(
      Seq((1L, "a", 1.0)).toDF("id", "tag", "score").coalesce(1), s"$tmp2/b_new")
    val mixedDf = graft.etl.AvroSource
      .readAvroProjected(spark, tmp2, Seq("id", "tag"))
    assert(mixedDf.schema.fields.forall(_.nullable),
      "projected fields must be nullable — a file may predate any of them")
    val mixed = mixedDf
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    assert(mixed === Seq((1L, Some("a")), (999L, None)))
    // an unknown projected column still fails loudly, naming the union
    val err = intercept[IllegalArgumentException] {
      graft.etl.AvroSource.readAvroProjected(spark, tmp, Seq("nope")) }
    assert(err.getMessage.contains("not in any file's schema"))
  }

  test("q_scan_csv: pipe-delimited round-trip equals the parquet read") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val tmp = Files.createTempDirectory("graft_csv").toString
    DelimitedSource.write(li, tmp)
    val back = DelimitedSource.read(spark, tmp, li.schema)
    assert(back.schema === li.schema)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).count() === 0)
    assert(li.exceptAll(back).count() === 0)
  }

  test("csv reject capture: malformed lines land in _reject, good rows load clean") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
    val schema = new StructType().add("id", IntegerType).add("name", StringType)
      .add("qty", IntegerType)
    val tmp = Files.createTempDirectory("graft_rej").resolve("batch.txt")
    Files.write(tmp, Seq(
      "1|alpha|10",
      "2|beta|not_a_number", // unparseable int -> reject
      "3|gamma|30",
      "4|delta|5|EXTRA|COLS" // arity overflow -> reject
    ).mkString("\n").getBytes)
    val rows = DelimitedSource.readWithRejects(spark, tmp.toString, schema)
      .cache() // Spark cannot filter on ONLY the corrupt column of a lazy scan
    val good = rows.filter(col("_reject").isNull)
    val bad = rows.filter(col("_reject").isNotNull)
    assert(good.count() === 2)
    assert(good.select("id").collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    val rejects = bad.select("_reject").collect().map(_.getString(0)).sorted.toSeq
    assert(rejects === Seq("2|beta|not_a_number", "4|delta|5|EXTRA|COLS"),
      "reject column must carry the raw malformed lines")
    rows.unpersist()
  }

  private val finwireLines = Seq(
    //        PTS(15)        TYP(3) then per-type layout from offset 19
    "20070102-120000CMP" + "Acme Corporation    " + "0000001234" + "ACTV",
    "20070102-120001CMP" + "Globex Holdings     " + "0000005678" + "INAC",
    "20070103-090000SEC" + "ACME           "      + "COMMON" + "0000001234",
    "20070104-090000FIN" + "2007" + "1" + "000000017500.50",
  )

  private val layouts = Map(
    "CMP" -> Seq(FieldSpec("pts", 1, 15), FieldSpec("company_name", 19, 20),
                 FieldSpec("cik", 39, 10, LongType), FieldSpec("status", 49, 4)),
    "SEC" -> Seq(FieldSpec("pts", 1, 15), FieldSpec("symbol", 19, 15),
                 FieldSpec("issue_type", 34, 6), FieldSpec("co_cik", 40, 10, LongType)),
    "FIN" -> Seq(FieldSpec("pts", 1, 15), FieldSpec("year", 19, 4, IntegerType),
                 FieldSpec("quarter", 23, 1, IntegerType),
                 FieldSpec("revenue", 24, 15, DoubleType)))

  test("q_scan_fixedwidth: FINWIRE multi-record-type dispatch slices per layout") {
    val tmp = Files.createTempDirectory("graft_fw").resolve("finwire.txt")
    Files.write(tmp, finwireLines.mkString("\n").getBytes)
    val byType = FixedWidthSource.readTyped(spark, tmp.toString, 16, 3, layouts)

    val cmp = byType("CMP").orderBy("pts").collect()
    assert(cmp.length === 2)
    assert(cmp(0).getAs[String]("company_name") === "Acme Corporation")
    assert(cmp(0).getAs[Long]("cik") === 1234L)
    assert(cmp(1).getAs[String]("status") === "INAC")

    val sec = byType("SEC").collect()
    assert(sec.length === 1)
    assert(sec(0).getAs[String]("symbol") === "ACME")
    assert(sec(0).getAs[Long]("co_cik") === 1234L)

    val fin = byType("FIN").collect()
    assert(fin.length === 1)
    assert(fin(0).getAs[Int]("year") === 2007)
    assert(fin(0).getAs[Int]("quarter") === 1)
    assert(fin(0).getAs[Double]("revenue") === 17500.50)
  }

  test("fixed-width reject capture: short and cast-failing lines land in _reject") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft_fw_rej").resolve("batch.txt")
    Files.write(tmp, Seq(
      "ab   42", // clean
      "cd   4x", // cast failure: '4x' is not an int -> reject
      "ef",      // truncated below the layout extent -> reject
      "gh    7"  // clean (space-padded int)
    ).mkString("\n").getBytes)
    val rows = FixedWidthSource.readWithRejects(spark, tmp.toString,
      Seq(FieldSpec("name", 1, 4), FieldSpec("n", 5, 3, IntegerType)))
    val good = rows.filter(col("_reject").isNull)
    val bad = rows.filter(col("_reject").isNotNull)
    assert(good.count() === 2)
    assert(good.orderBy("name").collect().map(_.getString(0)).toSeq === Seq("ab", "gh"))
    assert(bad.select("_reject").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("cd   4x", "ef"), "reject column must carry the raw malformed lines")
  }

  test("fixed-width typed reject capture: unknown record tags are accounted, not dropped") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft_fw_rej2").resolve("finwire.txt")
    Files.write(tmp, (finwireLines :+
      ("20070105-090000XXX" + "mystery-payload") :+          // unknown tag
      ("20070106-090000FIN" + "20x7" + "1" + "000000017500.50") // FIN year cast fail
    ).mkString("\n").getBytes)
    val byType = FixedWidthSource.readTypedWithRejects(spark, tmp.toString, 16, 3, layouts)
    // clean frames match the no-reject reader's rows
    assert(byType("CMP").filter(col("_reject").isNull).count() === 2)
    assert(byType("SEC").filter(col("_reject").isNull).count() === 1)
    assert(byType("FIN").filter(col("_reject").isNull).count() === 1)
    val finBad = byType("FIN").filter(col("_reject").isNotNull).collect()
    assert(finBad.length === 1 && finBad.head.getAs[String]("_reject").contains("20x7"))
    val unknown = byType("_unknown").collect()
    assert(unknown.length === 1)
    assert(unknown.head.getAs[String]("rec_type") === "XXX")
    assert(unknown.head.getAs[String]("_reject").contains("mystery-payload"))
  }

  test("xml reject capture: malformed records land in _reject, good rows load clean") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
    val schema = new StructType().add("id", IntegerType).add("name", StringType)
    val tmp = Files.createTempDirectory("graft_xml_rej").resolve("batch.xml")
    Files.write(tmp, Seq(
      "<rows>",
      "<row><id>1</id><name>ok</name></row>",
      "<row><id>notanint</id><name>bad-type</name></row>", // schema violation
      "<row><id>3</id><name>fine</name></row>",
      "</rows>").mkString("\n").getBytes)
    val rows = graft.etl.XmlSource
      .readWithRejects(spark, tmp.toString, "row", schema).cache()
    rows.count()
    val clean = rows.filter(col("_reject").isNull)
    val rejects = rows.filter(col("_reject").isNotNull)
    assert(clean.count() === 2, "exactly the two well-formed records load")
    assert(clean.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    assert(rejects.count() === 1, "the malformed record is captured, not dropped")
    assert(rejects.collect().forall(_.getAs[String]("_reject").nonEmpty))
    rows.unpersist()
  }

  test("fixed-width single-layout read trims space padding") {
    val tmp = Files.createTempDirectory("graft_fw1").resolve("pad.txt")
    Files.write(tmp, "ab   42\nc     7".getBytes)
    val df = FixedWidthSource.read(spark, tmp.toString,
      Seq(FieldSpec("name", 1, 4), FieldSpec("n", 5, 3, IntegerType)))
    val rows = df.orderBy("name").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ===
           Seq(("ab", 42), ("c", 7)))
  }
}
