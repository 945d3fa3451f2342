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
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as a long (legacy conf) and convert
    * to a µs TimestampType with integer division — the values carry µs
    * resolution, so the truncation is lossless and matches DuckDB's µs read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  /** Streaming variant of `events` (T1 incremental ingest): same nanos→µs
    * conversion, but over `readStream` on a DIRECTORY of event parquet files
    * (FileStreamSource requires a directory) so Trigger.AvailableNow can
    * drain it incrementally.
    */
  def eventsStream(s: SparkSession, sfDir: String, streamDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, sfDir, "events") // ts arrives as LongType nanos
    s.readStream.schema(raw.schema).parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
    t(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
}
