package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ingest.Ingest

/** The §1.1 parity claim: the reference's stored columns are materialized
  * window-function outputs (ranking ≅ rank(), new_entry ≅ "absent
  * yesterday", *_increase_decrease ≅ lag deltas, total_* ≅ running sums) —
  * our engine must DERIVE them from the long-format fact table, not just
  * store them. The fixture's stored values are generated self-consistently,
  * so deriving them with W1–W5 must reproduce them exactly.
  * Plus the FIXTURES.md §B3 contract: toLong ∘ toWide ≡ identity.
  */
class LongFormatSpec extends SparkSpec {
  import spark.implicits._

  // (day, code, title, sales, audience): chart with entries and exits —
  // code 3 exits after day 2, code 4 enters on day 2.
  private val raw = Seq(
    ("2025-01-13", 1L, "MovieA", 5000L, 500L),
    ("2025-01-13", 2L, "MovieB", 4000L, 400L),
    ("2025-01-13", 3L, "MovieC", 3000L, 300L),
    ("2025-01-14", 1L, "MovieA", 4500L, 450L),
    ("2025-01-14", 2L, "MovieB", 4800L, 480L),
    ("2025-01-14", 3L, "MovieC", 1000L, 100L),
    ("2025-01-14", 4L, "MovieD", 2000L, 200L),
    ("2025-01-15", 1L, "MovieA", 6000L, 600L),
    ("2025-01-15", 2L, "MovieB", 3000L, 300L),
    ("2025-01-15", 4L, "MovieD", 2500L, 250L))

  /** Long-format fixture with stored values computed self-consistently
    * (ranking from sales order, deltas vs the previous day, running
    * totals) — the ground truth the derivations must reproduce. */
  private lazy val longDf: DataFrame = {
    val byDay = raw.groupBy(_._1)
    val rows = raw.map { case (day, code, title, sales, audi) =>
      val dayRows = byDay(day).sortBy(-_._4)
      val ranking = dayRows.indexWhere(_._2 == code) + 1L
      val prevDay = Date.valueOf(day).toLocalDate.minusDays(1).toString
      val prev = raw.find(r => r._1 == prevDay && r._2 == code)
      val newEntry = if (prev.isEmpty) "NEW" else "OLD"
      val prevRanking = prev.map { p =>
        byDay(prevDay).sortBy(-_._4).indexWhere(_._2 == p._2) + 1L
      }
      val totalSales = raw.filter(r => r._2 == code && r._1 <= day)
        .map(_._4).sum
      (Date.valueOf(day), ranking, ranking,
        prevRanking.map(_ - ranking), newEntry, code, title,
        Date.valueOf("2025-01-01"), sales,
        prev.map(p => sales - p._4), totalSales, audi)
    }
    rows.toDF("show_range", "rank_num", "ranking", "increase_decrease",
      "new_entry", "code", "title", "released_date", "sales",
      "sales_increase_decrease", "total_sales", "audience_num")
  }

  test("W1-W5 derivations reproduce the stored KOFIC columns exactly") {
    val wDay = Window.partitionBy("show_range")
      .orderBy(col("sales").desc, col("code"))
    val wCode = Window.partitionBy("code").orderBy("show_range")
    val derived = longDf
      .withColumn("d_ranking", rank().over(wDay).cast("long"))
      .withColumn("prev_day", lag("show_range", 1).over(wCode))
      .withColumn("consecutive",
        col("prev_day") === date_sub(col("show_range"), 1))
      .withColumn("d_new_entry",
        when(col("consecutive"), "OLD").otherwise("NEW"))
      .withColumn("d_rank_delta",
        when(col("consecutive"),
          lag("ranking", 1).over(wCode) - col("ranking")))
      .withColumn("d_sales_delta",
        when(col("consecutive"), col("sales") - lag("sales", 1).over(wCode)))
      .withColumn("d_total_sales",
        sum("sales").over(wCode.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val bad = derived.filter(
      col("d_ranking") =!= col("ranking") ||
        col("d_new_entry") =!= col("new_entry") ||
        !(col("d_rank_delta") <=> col("increase_decrease")) ||
        !(col("d_sales_delta") <=> col("sales_increase_decrease")) ||
        col("d_total_sales") =!= col("total_sales"))
      .collect() // once — assert's by-value clue would re-run the job
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("toLong ∘ toWide is the identity on a day's table (FIXTURES §B3)") {
    val d8 = "20250114"
    val oneDay = longDf.filter($"show_range" === "2025-01-14")
      // complete the canonical 20-column shape with the remaining fields
      .withColumn("sales_ratio", lit(10.0))
      .withColumn("sales_increase_decrease_ratio", lit(1.5))
      .withColumn("audience_increase_decrease", lit(0L))
      .withColumn("audience_increase_decrease_ratio", lit(0.0))
      .withColumn("total_audience_num", lit(1000L))
      .withColumn("screen_num", lit(500L))
      .withColumn("screen_show", lit(2000L))
      .withColumn("box_office_type", lit("일별 박스오피스"))
    val back = Ingest.toLong(Ingest.toWide(oneDay, d8), d8)
    assert(back.columns.sorted.toSeq === oneDay.columns.sorted.toSeq)
    val a = oneDay.select(back.columns.map(col): _*).sort("code").collect()
    val b = back.sort("code").collect()
    assert(a.toSeq === b.toSeq)
  }
}
