package graft.queries

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the testdata schema contract every query relies on, so a
  * driver-side regeneration of the parquet tables surfaces as THIS
  * failure with a named column, not as dozens of inscrutable downstream
  * errors. Round 7 precedent: `events.ts` silently switched encodings
  * between rounds (ns-INT64 → µs-NTZ) and three queries started throwing
  * mid-gate — `Tables.load` now normalizes both, and this spec is where
  * the NEXT such drift gets caught first. Types are asserted AFTER
  * `Tables.load`, i.e. on what queries actually see. */
class TestdataContractSpec extends SparkSpec {

  /** EVERY table and column the 105-query surface reads (FIXTURES.md §B
    * is the full schema; nothing asserted here is unused by a query). */
  private def contract: Map[String, Map[String, DataType]] = Map(
    "region" -> Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "supplier" -> Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType),
    // ts asserted as the session-zone timestamp Tables.load guarantees,
    // whatever parquet encoding the driver ships this round
    "events" -> Map(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "orders" -> Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType),
    "customer" -> Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))

  test("ScaleData generates the same documents/embeddings shape the " +
      "probes and queries read (generator drift fails here, not in a " +
      "misread probe)") {
    import spark.implicits._
    val docs = spark.range(10).map(i => graft.ScaleData.doc(i))
    val embs = spark.range(10).map(i => graft.ScaleData.emb(i))
    // containsNull differs by construction (case-class encoders emit
    // non-nullable arrays; driver parquet is nullable) — the queries
    // only depend on the element type, so that is what's pinned
    def norm(t: DataType): DataType = t match {
      case ArrayType(e, _) => ArrayType(norm(e), containsNull = true)
      case other => other
    }
    Seq("documents" -> docs.toDF(), "embeddings" -> embs.toDF()).foreach {
      case (table, df) =>
        contract(table).foreach { case (name, expected) =>
          val field = df.schema.find(_.name == name)
          assert(field.isDefined, s"ScaleData $table drifted: lost " +
            s"'$name' (schema now: ${df.schema.simpleString})")
          assert(norm(field.get.dataType) == norm(expected),
            s"ScaleData $table.$name drifted to " +
              s"${field.get.dataType.simpleString}; the testdata contract " +
              s"says ${expected.simpleString}")
        }
    }
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"tables at $sf carry the columns and types the queries read") {
      contract.foreach { case (table, cols) =>
        val schema = graft.Tables.load(spark, sf, table).schema
        cols.foreach { case (name, expected) =>
          val field = schema.find(_.name == name)
          assert(field.isDefined,
            s"$table at $sf lost column '$name' — the driver regenerated " +
              s"testdata with a new shape; audit Tables.load and every " +
              s"query reading it (schema now: ${schema.simpleString})")
          assert(field.get.dataType == expected,
            s"$table.$name at $sf changed type: " +
              s"${field.get.dataType.simpleString} (queries expect " +
              s"${expected.simpleString}) — normalize it in Tables.load " +
              s"like the ts encodings")
        }
      }
    }
  }
}
