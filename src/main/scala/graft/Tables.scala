package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader over the driver testdata layout
  * (`<dir>/<name>.parquet`, see TESTDATA.md).
  *
  * Scale note: plain `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes filters/projections into the parquet reader
  * (`PushedFilters`/`ReadSchema`); at 100 TB the same call works over a
  * partitioned directory tree and gets partition pruning for free.
  */
object Tables {
  import org.apache.spark.sql.types._

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema contract: assert the logical types downstream operators assume.
    * Purely metadata — no data is read — so the cost is nil, and a testdata
    * regeneration that drifts a physical type fails HERE with the table and
    * column named, instead of as an opaque analysis error 30 operators deep
    * (the round-8 events µs/nanos break). Checks a key subset per table, not
    * the full schema, so additive evolution stays legal.
    */
  private def expectTypes(df: DataFrame, table: String, cols: (String, DataType)*): DataFrame = {
    cols.foreach { case (c, dt) =>
      val actual = df.schema.fields.find(_.name == c).map(_.dataType)
      // compare SQL type names (nullability-agnostic: parquet writers vary on
      // element/field nullability, which is irrelevant to operator semantics).
      // TIMESTAMP accepts both flavors: parquet isAdjustedToUTC decides
      // whether Spark reads TIMESTAMP or TIMESTAMP_NTZ, and with the session
      // timezone pinned to UTC every operator here treats them identically.
      val ok = actual.exists { a =>
        a.sql == dt.sql ||
          (dt.sql.startsWith("TIMESTAMP") && a.sql.startsWith("TIMESTAMP"))
      }
      require(ok,
        s"schema contract violated: $table.$c expected ${dt.sql} but testdata has " +
          s"${actual.map(_.sql).getOrElse("<column missing>")} — " +
          "update Tables.scala contract or adapt the loader (see Tables.normalizeTs)")
    }
    df
  }

  def lineitem(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "lineitem"), "lineitem",
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_shipdate" -> TimestampType)
  def orders(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "orders"), "orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType)
  def customer(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "customer"), "customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType)
  def supplier(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "supplier"), "supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
  def nation(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "nation"), "nation",
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
  def region(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "region"), "region", "r_regionkey" -> IntegerType)
  def part(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "part"), "part",
      "p_partkey" -> LongType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  /** events.parquet has shipped with `ts` as either parquet TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read nanos as a long via the
    * legacy conf and integer-divide to µs, losslessly, matching DuckDB's µs
    * read) or plain TIMESTAMP(MICROS)/NTZ (pass through, normalized to
    * TimestampType). Adapt to whatever physical type the current file has so
    * testdata regeneration can't break every events query again.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TimestampNTZType or other timestamp-like: normalize to µs TimestampType
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expectTypes(normalizeTs(t(s, d, "events")), "events",
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "value" -> DoubleType)
  }
  /** Streaming variant of `events` (T1 incremental ingest): same ts
    * normalization, but over `readStream` on a DIRECTORY of event parquet
    * files (FileStreamSource requires a directory) so Trigger.AvailableNow
    * can drain it incrementally.
    */
  def eventsStream(s: SparkSession, sfDir: String, streamDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, sfDir, "events") // schema template: ts may be long-nanos or timestamp
    normalizeTs(s.readStream.schema(raw.schema).parquet(streamDir))
  }

  /** documents/embeddings ship as ONE small parquet file ⇒ one input split,
    * so every expensive per-row expression (sha256 MinHash signatures,
    * 64-dim dot products) would run in a single task regardless of core
    * count (observed: 75s single-threaded vs ~2s spread). A round-robin
    * repartition to the default parallelism restores the multi-split layout
    * a real table has; the shuffled payload is the small source table
    * itself, not derived data.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    // contract covers only the columns EVERY caller needs — fixture-driven
    // specs legitimately write subset-schema documents tables
    expectTypes(t(s, d, "documents"), "documents",
      "doc_id" -> LongType, "text" -> StringType)
      .repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    expectTypes(t(s, d, "embeddings"), "embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
      .repartition(s.sparkContext.defaultParallelism)
}
