package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest path (SURVEY.md §2.A A1–A9): the reference's
  * `daily_parquet_pipeline.py` re-expressed as one in-process Spark job.
  *
  * Reference semantics reproduced:
  *  - A1/A2 (`daily_parquet_pipeline.py:23-42`): descend
  *    `boxOfficeResult.dailyBoxOfficeList`, hoist `boxofficeType` and
  *    `showRange` onto every element. The HTTP fetch itself is out of engine
  *    scope — `parsePayload` takes the payload text (from a fixture file or
  *    any driver-side fetch) and does everything after the socket.
  *  - B1 (`:44-82`): the exact 18-entry rename map to date-prefixed columns,
  *    `released_date` parse, `showRange "A~B" → first date`.
  *  - DDL types (`:105-141`): BIGINT counts, DOUBLE ratios, DATE dates —
  *    applied as casts instead of a warehouse-side CREATE TABLE.
  *  - B5 (`daily_csv_pipeline.py:40-42`): empty-payload guard.
  *  - A5/A8/A9 (`:84-161`): Parquet write + idempotent `saveAsTable` +
  *    scan→insertInto bulk load, collapsed to Spark writers (the S3→COPY
  *    hop disappears — executors write the table files directly).
  *
  * Scale posture: ingest is map-only (parse → explode → project), so it
  * pipelines entirely inside one codegen stage per file split; a day of
  * payloads at 100 TB is just more input splits, no shuffle anywhere.
  *
  * A7 (object-store put): every writer/reader here takes any Hadoop
  * filesystem URI — pointing the same code at `s3a://bucket/path` is
  * config, not code. This is TESTED, not just asserted:
  * S3ObjectStoreSpec runs these writers (and the parquet/CSV round-trip
  * paths) against an `s3a://` URI backed by an in-process flat-namespace
  * blob store (S3StubFileSystem: list-by-prefix, copy+delete rename) and
  * measures the rename-commit tax directly. Standard production settings
  * for the real connector:
  * {{{
  * spark.hadoop.fs.s3a.aws.credentials.provider=
  *   org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider
  * spark.hadoop.fs.s3a.committer.name=magic       // no rename commit on S3
  * spark.sql.sources.commitProtocolClass=
  *   org.apache.spark.internal.io.cloud.PathOutputCommitProtocol
  * spark.hadoop.fs.s3a.connection.maximum=96      // match executor cores
  * }}}
  * The magic committer matters at 100 TB: the default FileOutputCommitter
  * v1 renames every task file sequentially on the driver — hours on a
  * large write; the magic committer completes multipart uploads in O(1)
  * per file with no rename.
  */
object Ingest {

  /** The 18 per-movie fields all arrive as strings (§1.2). */
  private val listFields = Seq("rnum", "rank", "rankInten", "rankOldAndNew",
    "movieCd", "movieNm", "openDt", "salesAmt", "salesShare", "salesInten",
    "salesChange", "salesAcc", "audiCnt", "audiInten", "audiChange",
    "audiAcc", "scrnCnt", "showCnt")

  val payloadSchema: StructType = StructType(Seq(
    StructField("boxOfficeResult", StructType(Seq(
      StructField("boxofficeType", StringType),
      StructField("showRange", StringType),
      StructField("dailyBoxOfficeList",
        ArrayType(StructType(listFields.map(StructField(_, StringType)))))
    )))))

  /** A1: fetch one day's payload over HTTP — the reference's
    * `requests.get(url); if status_code != 200: raise`
    * (daily_parquet_pipeline.py:23-42, daily_csv_pipeline.py:63-64) with
    * the production hardening the reference delegates to Airflow retries:
    * connect/read timeouts, bounded retry with linear backoff on 5xx and
    * transport errors, fail-fast on 4xx (a bad key or date never succeeds
    * on retry, so retrying would only mask it).
    *
    * Driver-side by design: the KOFIC feed is ONE ~10-row payload per day
    * (BASELINE.md "per-run data volume"), so a driver fetch is the honest
    * shape. A large-scale variant (millions of URLs) would distribute the
    * SAME function over a URL Dataset via mapPartitions with per-partition
    * connection reuse — the parse stage downstream is already
    * distributed and unchanged.
    */
  def fetch(url: String, connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 10000, retries: Int = 2,
      backoffMs: Long = 200, maxBytes: Long = 16L * 1024 * 1024): String = {
    // resolve the URL BEFORE the retry loop: MalformedURLException is an
    // IOException, so inside the loop it would be retried as if transient
    // — a typo'd scheme never succeeds on retry (the 4xx rationale)
    val target = new java.net.URI(url).toURL
    var attempt = 0
    var lastErr: Exception = null
    while (attempt <= retries) {
      if (attempt > 0) Thread.sleep(backoffMs * attempt)
      try {
        val conn = target.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod("GET")
        try {
          val code = conn.getResponseCode
          if (code == 200)
            return readBounded(conn.getInputStream, maxBytes, url)
          // 3xx: HttpURLConnection does NOT follow cross-protocol
          // redirects (http->https), so a 301/302 here is terminal —
          // retrying burns attempts and masks the real cause. Surface
          // the Location so the caller can fix the URL.
          if (code >= 300 && code < 400)
            throw new IllegalStateException(
              s"GET $url -> $code (redirect to " +
                s"${Option(conn.getHeaderField("Location")).getOrElse("?")}" +
                "; not followed, not retried)")
          if (code >= 400 && code < 500)
            throw new IllegalStateException(
              s"GET $url -> $code (client error, not retried)")
          lastErr = new java.io.IOException(s"GET $url -> $code")
        } finally conn.disconnect()
      } catch {
        case e: IllegalStateException => throw e // 3xx/4xx: fail fast
        case e: java.io.IOException => lastErr = e // timeout/refused/5xx
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"GET $url failed after ${retries + 1} attempts", lastErr)
  }

  /** Bounded body read: throws past `maxBytes` instead of buffering an
    * unbounded response. The KOFIC payload is ~KBs, but this same
    * function is the one to distribute over millions of URLs via
    * mapPartitions — an uncapped readAllBytes there is an executor OOM
    * vector (one hostile/misconfigured endpoint streaming gigabytes
    * takes the task JVM down; a loud oversize error fails fast — the
    * IllegalStateException is deliberately NOT retried, since a server
    * that streams past the cap once will do it again — and names the
    * URL so the bad endpoint is attributable). */
  private def readBounded(in: java.io.InputStream, maxBytes: Long,
      url: String): String = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    var n = in.read(chunk)
    while (n >= 0) {
      buf.write(chunk, 0, n)
      if (buf.size() > maxBytes)
        throw new IllegalStateException(
          s"GET $url response exceeded $maxBytes bytes (oversize body, " +
            "not retried)")
      n = in.read(chunk)
    }
    new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** A2: payload JSON text → one row per ranked movie, parent fields
    * hoisted (daily_parquet_pipeline.py:34-40).
    */
  def parsePayload(payloads: Dataset[String]): DataFrame = {
    val parsed = payloads.select(
      from_json(col("value"), payloadSchema).getField("boxOfficeResult")
        .as("r"))
    parsed
      .select(col("r.boxofficeType").as("boxOfficeType"),
        col("r.showRange").as("showRange"),
        explode(col("r.dailyBoxOfficeList")).as("m"))
      .select(col("boxOfficeType") +: col("showRange") +:
        listFields.map(f => col(s"m.$f").as(f)): _*)
  }

  /** B1: the reference's rename dictionary, verbatim
    * (daily_parquet_pipeline.py:52-72). */
  def renameDict(d: String): Map[String, String] = Map(
    "rnum" -> s"${d}_rank_num",
    "rank" -> s"${d}_ranking",
    "rankInten" -> s"${d}_increase_decrease",
    "rankOldAndNew" -> s"${d}_new_entry",
    "movieCd" -> "code",
    "movieNm" -> "title",
    "openDt" -> "released_date",
    "salesAmt" -> s"${d}_sales",
    "salesShare" -> s"${d}_sales_ratio",
    "salesInten" -> s"${d}_sales_increase_decrease",
    "salesChange" -> s"${d}_sales_increase_decrease_ratio",
    "salesAcc" -> s"${d}_total_sales",
    "audiCnt" -> s"${d}_audience_num",
    "audiInten" -> s"${d}_audience_increase_decrease",
    "audiChange" -> s"${d}_audience_increase_decrease_ratio",
    "audiAcc" -> s"${d}_total_audience_num",
    "scrnCnt" -> s"${d}_screen_num",
    "showCnt" -> s"${d}_screen_show")

  /** DDL-boundary schema era (SURVEY §1.2): the reference ran two DDL
    * generations for the same 20-column shape — the legacy CSV DAG typed
    * counts INTEGER/NUMERIC (daily_csv_pipeline.py:127-148) while the
    * current Parquet DAG types them BIGINT/FLOAT
    * (daily_parquet_pipeline.py:114-135). Both eras coexist in the
    * warehouse, so the engine must ingest either and reconcile them
    * (the E2 design case, SURVEY §2.E).
    */
  sealed trait SchemaEra
  case object ParquetEra extends SchemaEra
  case object CsvEra extends SchemaEra

  /** Column type at the DDL boundary, by date-stripped suffix
    * (daily_parquet_pipeline.py:114-135). */
  private val suffixTypes: Map[String, DataType] = Map(
    "rank_num" -> LongType, "ranking" -> LongType,
    "increase_decrease" -> LongType, "new_entry" -> StringType,
    "sales" -> LongType, "sales_ratio" -> DoubleType,
    "sales_increase_decrease" -> LongType,
    "sales_increase_decrease_ratio" -> DoubleType,
    "total_sales" -> LongType, "audience_num" -> LongType,
    "audience_increase_decrease" -> LongType,
    "audience_increase_decrease_ratio" -> DoubleType,
    "total_audience_num" -> LongType, "screen_num" -> LongType,
    "screen_show" -> LongType)

  /** Legacy CSV-era types (daily_csv_pipeline.py:127-148): INTEGER ranks
    * and screen counts, NUMERIC (Redshift default = DECIMAL(18,0)) money
    * and audience counts, one literal `bigint` (sales_increase_decrease).
    */
  private val csvSuffixTypes: Map[String, DataType] = Map(
    "rank_num" -> IntegerType, "ranking" -> IntegerType,
    "increase_decrease" -> IntegerType, "new_entry" -> StringType,
    "sales" -> DecimalType(18, 0), "sales_ratio" -> DoubleType,
    "sales_increase_decrease" -> LongType,
    "sales_increase_decrease_ratio" -> DoubleType,
    "total_sales" -> DecimalType(18, 0),
    "audience_num" -> DecimalType(18, 0),
    "audience_increase_decrease" -> DecimalType(18, 0),
    "audience_increase_decrease_ratio" -> DoubleType,
    "total_audience_num" -> DecimalType(18, 0),
    "screen_num" -> IntegerType, "screen_show" -> IntegerType)

  /** B1 + H1/H2 + DDL casts: flattened rows → the day's wide typed table
    * (daily_parquet_pipeline.py:44-93 + :105-141 in one projection; with
    * `era = CsvEra`, the legacy daily_csv_pipeline.py:118-154 types —
    * including `code NUMERIC` vs the parquet path's BIGINT).
    */
  def dailyTable(flat: DataFrame, targetDate: String,
      era: SchemaEra = ParquetEra): DataFrame = {
    val types = era match {
      case ParquetEra => suffixTypes
      case CsvEra => csvSuffixTypes
    }
    val codeType: DataType = era match {
      case ParquetEra => LongType
      case CsvEra => DecimalType(18, 0)
    }
    val renamed = flat.withColumnsRenamed(renameDict(targetDate))
    val typed = renamed.columns.map {
      case c @ "code" => col(c).cast(codeType).as(c)
      case c @ "title" => col(c)
      case c @ "released_date" => to_date(col(c), "yyyy-MM-dd").as(c)
      case c @ "showRange" =>
        to_date(split(col(c), "~").getItem(0), "yyyyMMdd").as(c)
      case c @ "boxOfficeType" => col(c)
      case c =>
        val suffix = c.stripPrefix(s"${targetDate}_")
        col(c).cast(types.getOrElse(suffix, StringType)).as(c)
    }
    renamed.select(typed: _*)
  }

  /** Era reconciliation: cast a wide daily table (either era) to the
    * canonical Parquet-era types so CSV-era and Parquet-era days union
    * losslessly — every CSV-era type widens into its canonical twin
    * (INTEGER ⊂ BIGINT, DECIMAL(18,0) ⊂ BIGINT for these count columns).
    * The E2 set-reconciliation (intersect/except of keys across eras) is
    * well-typed only after this normalization.
    */
  def normalizeEra(wide: DataFrame, targetDate: String): DataFrame = {
    val typed = wide.columns.map {
      case c @ "code" => col(c).cast(LongType).as(c)
      case c @ ("title" | "released_date" | "showRange" | "boxOfficeType") =>
        col(c)
      case c =>
        val suffix = c.stripPrefix(s"${targetDate}_")
        col(c).cast(suffixTypes.getOrElse(suffix, StringType)).as(c)
    }
    wide.select(typed: _*)
  }

  /** B5: abort when the API list is empty (daily_csv_pipeline.py:40-42). */
  def requireNonEmpty(df: DataFrame, context: String): DataFrame = {
    if (df.isEmpty)
      throw new IllegalStateException(s"$context: empty payload, aborting")
    df
  }

  /** A5 + A8: write the day's table idempotently (CREATE TABLE IF NOT
    * EXISTS ≙ mode("ignore")) into the session catalog as Parquet.
    */
  def saveDaily(df: DataFrame, targetDate: String): String = {
    val table = s"raw_${targetDate}_box_office"
    df.write.mode("ignore").format("parquet").saveAsTable(table)
    table
  }

  /** A9: bulk load staged Parquet into an existing table — the reference's
    * S3→Redshift COPY collapses to scan + insertInto (one Spark job, no
    * intermediate hop).
    */
  def bulkLoad(spark: SparkSession, stagedDir: String, table: String): Unit =
    spark.read.parquet(stagedDir).write.mode("append").insertInto(table)

  /** Long-column name for an API field under a given date — derived from
    * renameDict so the long/wide mapping exists in exactly ONE place
    * (renameDict) and toLong/toWide cannot drift apart. */
  private def longColName(field: String, d: String): String =
    renameDict(d)(field).stripPrefix(s"${d}_")

  /** Canonical long-format fact row (SURVEY.md §1.5): the wide,
    * date-prefixed layout is a Redshift-era workaround — natively the same
    * information is one fact table partitioned by date. The wide layout
    * stays reproducible via toWide / Consolidate's pivot.
    */
  def toLong(wide: DataFrame, targetDate: String): DataFrame = {
    val d = targetDate
    wide.select(
      col("showRange").as("show_range") +:
        listFields.map(f => col(renameDict(d)(f)).as(longColName(f, d))) :+
        col("boxOfficeType").as("box_office_type"): _*)
  }

  /** Long-format store writer: Parquet partitioned by show_range, so the
    * dbt-era "last 9 daily tables" selection (B7) becomes partition pruning
    * on a date predicate — at 100 TB a 9-day query touches 9 directories.
    */
  def appendLongStore(df: DataFrame, path: String): Unit =
    df.write.mode("append").partitionBy("show_range").parquet(path)

  /** Retry-safe long-store writer for per-date jobs (the form
    * `Pipeline.backfill` requires): DYNAMIC partition overwrite replaces
    * exactly the show_range partitions present in `df`, so re-running a
    * date after a mid-job failure rewrites its partition instead of
    * appending duplicates — plain `append` is NOT retry-safe once any
    * task file has committed. Same mechanism as the streaming
    * `idempotentDailySink`; commit is staged under `_temporary` and moved
    * only on job commit, so a crashed attempt leaves no partition files
    * behind (on object stores pair this with the magic committer, per the
    * A7 note above).
    */
  def upsertLongStore(df: DataFrame, path: String): Unit =
    // per-WRITER option, not the session conf: mutating the session-global
    // partitionOverwriteMode is racy under concurrent jobs (another
    // writer's static overwrite would silently become dynamic, and
    // interleaved restores can strand the session on the wrong mode)
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("show_range").parquet(path)

  /** Inverse of toLong: reproduce the reference's wide per-day layout
    * (SURVEY §1.1) from the canonical long format — the derived view that
    * keeps every reference query expressible. Column ORDER matches
    * dailyTable's output exactly (boxOfficeType, showRange, then the 18
    * fields in API order), so positional consumers (insertInto) see the
    * same layout. toLong∘toWide ≡ identity on a day's table
    * (FIXTURES.md §B3's B2 → B3 → B2 round trip).
    */
  def toWide(long: DataFrame, targetDate: String): DataFrame = {
    val d = targetDate
    long.select(
      col("box_office_type").as("boxOfficeType") +:
        col("show_range").as("showRange") +:
        listFields.map(f => col(longColName(f, d)).as(renameDict(d)(f))): _*)
  }
}
