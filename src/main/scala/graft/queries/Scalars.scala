package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function block (SURVEY.md §2.8): string / regex / date / math /
  * JSON / array functions — the surface every TPC-DI transform leans on
  * (FINWIRE substring slicing, phone-number regex assembly, DimDate attribute
  * derivation, commission/tax money math, semi-structured props, vector
  * columns).
  *
  * All pure built-in Catalyst expressions — zero UDFs — so every query stays
  * inside whole-stage codegen and the scan prunes to exactly the referenced
  * columns. Cross-engine parity rules (SURVEY.md §5.3) applied per function:
  * regex patterns kept POSIX-compatible, DuckDB `regexp_replace` needs the
  * explicit 'g' flag to match Spark's replace-all, day-of-week normalized to
  * DuckDB's 0=Sunday, `date_trunc('month')` cast to DATE on both sides
  * (DuckDB returns DATE, Spark TIMESTAMP), `floor`/`ceil` cast to BIGINT on
  * both sides (DuckDB returns DOUBLE, Spark BIGINT), every floating output
  * rounded identically on both sides.
  */
object Scalars {

  /** §2.8 String functions: upper/substring/length/concat/lpad/trim/replace —
    * the FINWIRE record slicing + Prospect↔Customer name-normalization shapes. */
  def qStrFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 4).as("name_pre"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"))
      .orderBy("p_partkey")

  /** §2.8 Regex functions: group extraction, match test, replace-all — the
    * phone-assembly / CoNameOrCIK-digit-test shapes. Patterns restricted to
    * syntax Java regex and DuckDB's RE2 read identically. */
  def qRegexFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "^([0-9]+)-(.*)$", 1).as("prio_num"),
        regexp_extract(col("o_orderpriority"), "^([0-9]+)-(.*)$", 2).as("prio_word"),
        col("o_orderpriority").rlike("^[12]-").as("is_high"),
        regexp_replace(col("o_orderpriority"), "[AEIOU]", "_").as("prio_devowel"))
      .orderBy("o_orderkey")

  /** §2.8 Date/time functions — the DimDate attribute-derivation shape.
    * dow follows DuckDB's 0=Sunday convention (Spark dayofweek is 1=Sunday). */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        last_day(col("o_orderdate").cast("date")).as("eom"))
      .orderBy("o_orderkey")

  /** §2.8 Math functions — the commission/tax money-arithmetic shape.
    * pow is exercised on exact powers of two (libm pow is not guaranteed
    * correctly rounded cross-engine on arbitrary inputs); sqrt IS correctly
    * rounded per IEEE 754, so it is cross-engine exact. */
  def qMathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 0.07, 2).as("tax7"),
        round(abs(col("l_discount") - 0.05), 6).as("disc_dev"),
        floor(col("l_quantity")).cast("bigint").as("qty_floor"),
        ceil(col("l_quantity")).cast("bigint").as("qty_ceil"),
        pow(lit(2.0), col("l_linenumber")).as("pow2"),
        pmod(col("l_partkey"), lit(7L)).as("mod7"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
               "tax7", "disc_dev", "qty_floor", "qty_sqrt")

  /** §2.8 JSON extraction + aggregation over the extracted field — the
    * semi-structured props column (north-star) shape. Extracted value cast to
    * INT on both engines before any arithmetic. */
  def qJsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("k")), 4).as("avg_k"),
        sum(when(col("k") >= 50, 1).otherwise(0)).as("n_high"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** §2.8 VARIANT functions (r13) — Spark 4's binary semi-structured type,
    * the 100 TB successor to [[qJsonFuncs]]'s string path: `parse_json`
    * decodes the JSON text ONCE per row into the variant binary encoding,
    * and every `variant_get` after that is an O(path) binary traversal —
    * where each `get_json_object` call re-parses the whole string per
    * extraction (k extractions = k parses; the difference is the scan CPU
    * at scale, and variant-shredded parquet pushes the extraction into the
    * reader entirely). Two sources exercise the surface: the real
    * `events.props` document (int extraction with an explicit target type),
    * and a nested document built from typed columns and round-tripped
    * through the encoder (string + long extraction at depth — the grouping
    * key itself is a variant-extracted string, and `n_uid_roundtrip` proves
    * the long survived text→variant→long losslessly on EVERY row: the
    * oracle restates it as `count(*)`). One scan, map-side parse+extract,
    * one hash agg with partials. */
  def qVariantFuncs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = parse_json(col("props"))
    val nested = parse_json(to_json(struct(
      struct(col("event_type").as("et"), col("user_id").as("uid")).as("u"))))
    ev.select(col("user_id"),
        variant_get(v, "$.k", "int").as("k"),
        variant_get(nested, "$.u.et", "string").as("et2"),
        variant_get(nested, "$.u.uid", "long").as("uid2"))
      .groupBy("et2")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"), // sum over int is already LongType
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(when(col("uid2") === col("user_id"), 1L).otherwise(0L))
          .as("n_uid_roundtrip"))
      .orderBy("et2")
  }

  /** §2.8 Array functions over the 64-dim embedding column: size, element
    * access, higher-order transform/aggregate/filter — the north-star vector
    * column surface. Elements are cast float→double (exact) inside the
    * lambdas so both engines fold identical IEEE doubles left-to-right. */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val emb = col("embedding")
    val dbl = transform(emb, x => x.cast("double"))
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"), col("label"),
        size(emb).as("dim"),
        round(element_at(emb, 1).cast("double"), 6).as("first_elem"),
        round(aggregate(dbl, lit(0.0), (a: Column, x: Column) => a + x), 4).as("vec_sum"),
        round(sqrt(aggregate(dbl, lit(0.0), (a: Column, x: Column) => a + x * x)), 4)
          .as("l2_norm"),
        size(filter(emb, (x: Column) => x > 0)).as("n_pos"))
      .orderBy("vec_id")
  }

  /** §2.8 Map surface: build a map column from key/value arrays, scalar
    * value access (hit and miss), key/value lists, membership, cardinality —
    * the tags/properties payload shape. The map column itself stays internal:
    * the oracle harness sorts output rows in pandas, where map cells are
    * unhashable, so every output column is a scalar derivation of the map
    * (the operators are still exercised; only the projection is flattened). */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val attrs = map_from_arrays(
      array(lit("brand"), lit("type")),
      array(col("p_brand"), col("p_type")))
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        element_at(attrs, "brand").as("brand_val"),
        element_at(attrs, "type").as("type_val"),
        element_at(attrs, "nope").as("missing_val"),
        concat_ws(",", map_keys(attrs)).as("key_list"),
        concat_ws(",", map_values(attrs)).as("val_list"),
        array_contains(map_keys(attrs), "brand").as("has_brand"),
        size(attrs).as("n_attrs"))
      .orderBy("p_partkey")
  }

  /** §2.8 Struct (nested-type) surface: build a named struct column, read
    * fields back out, nest a struct in a struct and extract through both
    * levels — the typed-payload shape multimodal metadata and CDC envelopes
    * use. Structs stay internal (pandas can't sort dict cells in the oracle
    * diff); the output is scalar field extractions plus a deterministic
    * string rendering of the struct. */
  def qStructFuncs(spark: SparkSession, dir: String): DataFrame = {
    val info = struct(col("p_brand").as("brand"), col("p_size").as("sz"))
    val nested = struct(info.as("inner"), col("p_type").as("ptype"))
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        info.getField("brand").as("brand_field"),
        info.getField("sz").as("sz_field"),
        nested.getField("ptype").as("nested_ptype"),
        nested.getField("inner").getField("sz").as("nested_inner_sz"),
        concat_ws("|", info.getField("brand"),
          info.getField("sz").cast("string")).as("info_str"),
        (col("p_size") > 25).as("is_large"))
      .orderBy("p_partkey")
  }
}
