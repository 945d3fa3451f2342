package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-contract + loader-adaptivity regression suite.
  *
  * Round-8 postmortem: the driver regenerated testdata with `events.ts` as
  * parquet TIMESTAMP(MICROS) while `Tables.events` still assumed the old
  * TIMESTAMP(NANOS)-as-long layout, breaking all 11 events queries. Two
  * defenses now exist and are both exercised here:
  *   1. `Tables.events` adapts to the physical type it finds (long-nanos,
  *      µs timestamp, or NTZ) — verified by loading the same logical rows
  *      through all three layouts and asserting identical results.
  *   2. every loader asserts a schema contract (metadata-only) that names
  *      the drifted column instead of failing 30 operators deep.
  */
class TablesContractSpec extends SparkSpec {

  test("every sf0.001 table loads and satisfies its schema contract") {
    val s = spark
    // parquet isAdjustedToUTC decides TIMESTAMP vs TIMESTAMP_NTZ on read;
    // both are legal under the contract (session TZ pinned UTC)
    def tsLike(dt: DataType) = dt == TimestampType || dt == TimestampNTZType
    // each loader throws IllegalArgumentException naming table.column on drift
    assert(tsLike(Tables.lineitem(s, sf0001).schema("l_shipdate").dataType))
    assert(tsLike(Tables.orders(s, sf0001).schema("o_orderdate").dataType))
    assert(Tables.customer(s, sf0001).schema("c_custkey").dataType == LongType)
    assert(Tables.supplier(s, sf0001).schema("s_suppkey").dataType == LongType)
    assert(Tables.nation(s, sf0001).schema("n_nationkey").dataType == IntegerType)
    assert(Tables.region(s, sf0001).schema("r_regionkey").dataType == IntegerType)
    assert(Tables.part(s, sf0001).schema("p_partkey").dataType == LongType)
    assert(Tables.events(s, sf0001).schema("ts").dataType == TimestampType)
    assert(Tables.documents(s, sf0001).schema("doc_id").dataType == LongType)
    assert(Tables.embeddings(s, sf0001).schema("embedding").dataType
      .isInstanceOf[ArrayType])
  }

  test("contract violation names the drifted table.column") {
    val dir = java.nio.file.Files.createTempDirectory("drift").toFile.getAbsolutePath
    // region with r_regionkey as STRING — a deliberate physical-type drift
    spark.range(3).select(col("id").cast("string").as("r_regionkey"),
        lit("x").as("r_name"))
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalArgumentException](Tables.region(spark, dir))
    assert(e.getMessage.contains("region.r_regionkey"), e.getMessage)
    assert(e.getMessage.contains("INT"), e.getMessage)
  }

  test("Tables.events adapts to long-nanos, µs-timestamp, and NTZ physical layouts") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("evtlayout").toFile.getAbsolutePath
    // one logical dataset: event at 2026-01-02T03:04:05.123456 UTC
    val micros = 1767323045123456L

    // layout A: ts as INT64 nanoseconds (what nanosAsLong produced pre-regen)
    Seq((1L, micros * 1000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")
    // layout B: ts as µs TimestampType (the current driver testdata)
    Seq((1L, 7L, "click", 1.5, "{}")).toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(micros)))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/micros/events.parquet")
    // layout C: ts as TIMESTAMP_NTZ (a plausible future drift)
    Seq((1L, 7L, "click", 1.5, "{}")).toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")

    val loaded = Seq("nanos", "micros", "ntz").map { layout =>
      val df = Tables.events(s, s"$base/$layout")
      assert(df.schema("ts").dataType == TimestampType, s"layout $layout")
      df.select(unix_micros(col("ts"))).as[Long].head()
    }
    assert(loaded.toSet == Set(micros),
      s"layouts disagree: ${Seq("nanos", "micros", "ntz").zip(loaded)}")
  }
}
