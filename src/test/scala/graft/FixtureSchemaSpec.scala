package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary: asserts the schema every graft query is
  * written against, as seen THROUGH `Tables.apply` (i.e. after its
  * normalizations). The round-7 incident this guards: the events
  * fixture silently changed physical type from TIMESTAMP(NANOS) to
  * timestamp[us], which flipped `ts` from LongType epoch-ns to
  * TIMESTAMP_NTZ and broke 17 event-time queries with scattered
  * analysis errors. A regenerated fixture should fail HERE, with a
  * message naming the drifted table/column — not 17 queries deep.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts: LongType epoch-ns is THE contract (Tables.normalizeEventTs);
    // every funnel/retention/gap/streaming query does `ts div 1000`
    "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every fixture table reads with the schema queries are written against") {
    Tables.names.foreach { name =>
      val got = Tables(spark, sf, name).schema
        .map(f => f.name -> f.dataType)
      assert(got == expected(name),
        s"FIXTURE DRIFT in $name: Tables read " +
          s"${got.mkString("[", ", ", "]")} but graft queries assume " +
          s"${expected(name).mkString("[", ", ", "]")} — if the fixture " +
          "was regenerated with new physical types, extend " +
          "Tables.normalizeEventTs (or its analogue) rather than " +
          "chasing per-query analysis errors")
    }
  }

  test("events.ts normalization covers both fixture generations") {
    import org.apache.spark.sql.functions._
    // the normalized column must be integer epoch-NANOS: µs precision
    // ×1000 (the current timestamp[us] fixture) or native ns (the
    // nanosAsLong generation); either way div 1000 gives sane µs in
    // the fixture's 2024+ range
    val bounds = Tables(spark, sf, "events")
      .agg(min(Tables.eventTsNs), max(Tables.eventTsNs)).head()
    val loNs = bounds.getLong(0)
    val hiNs = bounds.getLong(1)
    val y2020ns = 1577836800L * 1000000000L
    val y2100ns = 4102444800L * 1000000000L
    assert(loNs > y2020ns && hiNs < y2100ns,
      s"events.ts normalized range [$loNs, $hiNs] is not plausible " +
        "epoch-nanoseconds — Tables.normalizeEventTs mis-scaled the " +
        "fixture's physical type")
  }
}
