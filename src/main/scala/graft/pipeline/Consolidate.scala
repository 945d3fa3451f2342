package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's transform layer (K5/K6): both dbt models reproduced
  * parameterically over a date list, with every wide column name GENERATED
  * from the dates exactly as the Jinja does — never hardcoded.
  *
  *  - `boxOfficeData` ≙ `box_office_data.sql:1-32`: per-table base CTE
  *    normalizing `"{D}_sales" AS sales` (B4) + N-way UNION ALL (E1) +
  *    `MAX(CASE WHEN source_table = t THEN m END) AS "{D}_m"` pivot (D3)
  *    grouped by (title, code), ordered by (title, code).
  *  - `boxOfficeShowRange` ≙ `box_office_showrange.sql:1-29`: per-table
  *    GROUP BY showRange with 6 SUMs (D1, the partial phase) + UNION ALL +
  *    outer re-SUM (D2, the final phase).
  *
  * Scale posture: the pivot is conditional aggregation — ONE shuffle on
  * (title, code) regardless of how many dates consolidate (vs N−1 join
  * shuffles for the self-join formulation); Catalyst collapses the N
  * normalization projections into the union branches and pushes column
  * pruning into each scan. The showRange model's partial aggregation
  * reduces each day's partition to a handful of rows before the union, so
  * the final shuffle moves ~|dates| rows however large the days are.
  */
object Consolidate {

  private val Fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** K6 (`dbt_dags.py:12-20`): yesterday−(days−1) … yesterday, as the
    * yyyyMMdd-named tables the reference enumerates. */
  def tableNames(end: LocalDate, days: Int = 9): Seq[String] =
    (days - 1 to 0 by -1).map(i => s"${end.minusDays(i).format(Fmt)}_box_office")

  private def datePart(tableName: String): String =
    tableName.replace("_box_office", "") // the Jinja replace('_box_office','')

  /** Resolve table names against the session catalog — the dbt models'
    * `FROM raw_data."{table_name}"` (box_office_data.sql:15). Combined with
    * Ingest.saveDaily this runs the reference's full nightly flow:
    * ingest N days → catalog tables → consolidate by name.
    */
  def fromCatalog(spark: org.apache.spark.sql.SparkSession,
      names: Seq[String], prefix: String = "raw_")
      : Seq[(String, DataFrame)] =
    names.map(n => n -> spark.table(s"$prefix$n"))

  private val DataMeasures =
    Seq("sales", "total_sales", "audience_num", "total_audience_num")

  /** `box_office_data.sql` — tables maps table name → that day's wide frame. */
  def boxOfficeData(tables: Seq[(String, DataFrame)]): DataFrame = {
    require(tables.nonEmpty, "consolidation over zero tables")
    // base_data CTE: normalize date-prefixed columns to canonical names and
    // tag each branch with its source table (box_office_data.sql:6-15).
    val base = tables.map { case (t, df) =>
      val d = datePart(t)
      df.select(col("title") +: col("code") +:
        DataMeasures.map(m => col(s"${d}_$m").as(m)) :+
        lit(t).as("source_table"): _*)
    }.reduce(_ unionByName _)
    // pivot back to wide: MAX(CASE WHEN source_table = t) per date × measure
    // (box_office_data.sql:20-31).
    val pivots: Seq[Column] = for {
      (t, _) <- tables
      m <- DataMeasures
    } yield max(when(col("source_table") === t, col(m)))
      .as(s"${datePart(t)}_$m")
    base.groupBy("title", "code")
      .agg(pivots.head, pivots.tail: _*)
      .orderBy("title", "code") // box_office_data.sql:32
  }

  /** `box_office_data.sql` rendered to runnable Spark SQL TEXT — the
    * Jinja loop in Scala, for the ModelGraph runner (the DataFrame form
    * above stays the engine path; ModelGraphSpec proves text ≡ frame).
    * `rel` maps a dbt table name to its catalog relation (the
    * reference's `FROM raw_data."{t}"`, box_office_data.sql:15);
    * identifiers are backtick-quoted because the date-prefixed columns
    * start with digits (Postgres double quotes → Spark backticks). */
  def boxOfficeDataSql(tableNames: Seq[String],
      rel: String => String = identity): String = {
    require(tableNames.nonEmpty, "consolidation over zero tables")
    val branches = tableNames.map { t =>
      val d = datePart(t)
      val ms = DataMeasures.map(m => s"`${d}_$m` AS $m").mkString(", ")
      s"SELECT title, code, $ms, '$t' AS source_table FROM ${rel(t)}"
    }.mkString("\nUNION ALL\n")
    val pivots = (for { t <- tableNames; m <- DataMeasures } yield
      s"MAX(CASE WHEN source_table = '$t' THEN $m END)" +
        s" AS `${datePart(t)}_$m`").mkString(",\n  ")
    s"""WITH base_data AS (
       |$branches
       |)
       |SELECT title, code,
       |  $pivots
       |FROM base_data
       |GROUP BY title, code
       |ORDER BY title, code""".stripMargin
  }

  private val RangeMeasures = Seq(
    "sales" -> "total_sales",
    "total_sales" -> "total_total_sales",
    "audience_num" -> "total_audience_num",
    "total_audience_num" -> "total_total_audience_num",
    "screen_num" -> "total_screen_num",
    "screen_show" -> "total_screen_show")

  /** `box_office_showrange.sql` rendered to runnable Spark SQL TEXT —
    * the partial-per-table + final-over-union two-phase aggregation
    * (box_office_showrange.sql:1-29), for the ModelGraph runner. */
  def boxOfficeShowRangeSql(tableNames: Seq[String],
      rel: String => String = identity): String = {
    require(tableNames.nonEmpty, "consolidation over zero tables")
    val branches = tableNames.map { t =>
      val d = datePart(t)
      val partials = RangeMeasures.map { case (m, alias) =>
        s"SUM(`${d}_$m`) AS $alias"
      }.mkString(", ")
      s"SELECT showRange, $partials FROM ${rel(t)} GROUP BY showRange"
    }.mkString("\nUNION ALL\n")
    val finals = RangeMeasures.map(_._2)
      .map(a => s"SUM($a) AS $a").mkString(", ")
    s"""WITH base_data AS (
       |$branches
       |)
       |SELECT showRange, $finals
       |FROM base_data
       |GROUP BY showRange""".stripMargin
  }

  /** `box_office_showrange.sql` — explicit partial (per table) + final
    * (over the union) two-phase aggregation. */
  def boxOfficeShowRange(tables: Seq[(String, DataFrame)]): DataFrame = {
    require(tables.nonEmpty, "consolidation over zero tables")
    val base = tables.map { case (t, df) =>
      val d = datePart(t)
      val partials = RangeMeasures.map { case (m, alias) =>
        sum(col(s"${d}_$m")).as(alias)
      }
      df.groupBy("showRange").agg(partials.head, partials.tail: _*)
    }.reduce(_ unionByName _)
    val finals = RangeMeasures.map(_._2).map(a => sum(a).as(a))
    base.groupBy("showRange").agg(finals.head, finals.tail: _*)
  }
}
