package graft.ops

import graft.Q
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.F). The reference's stored columns
  * are materialized window outputs computed upstream by KOFIC: `*Inten` ≅
  * lag deltas, `*Acc` ≅ running sums, `rank` ≅ rank(), `rankOldAndNew` ≅
  * "lag is null" (daily_csv_pipeline.py:72-74; DDL csv:128-143). Our engine
  * derives all of them from the long-format fact table.
  *
  * Scale posture: every window partitions by a high-cardinality key
  * (customer), so state is distributed; the single global window in
  * `win_trailing7` operates on an already-reduced daily aggregate (≤ a few
  * thousand rows at any scale), never on raw facts.
  */
object Windows {

  private def byCust = Window.partitionBy("o_custkey")
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  val queries: Map[String, Q] = Map(
    // W1 + W6: lag delta and % change (salesInten / salesChange).
    "win_lag" -> ((s, d) =>
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("prev_price", lag("o_totalprice", 1).over(byCust))
        .withColumn("delta", col("o_totalprice") - col("prev_price"))
        .withColumn("pct_change",
          round((col("o_totalprice") / col("prev_price") - 1) * 100, 4))
        .orderBy("o_custkey", "o_orderkey")),

    // W1 mirror: lead — the forward-looking delta (next order's price).
    "win_lead" -> ((s, d) =>
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("next_price", lead("o_totalprice", 1).over(byCust))
        .withColumn("next_delta", col("next_price") - col("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")),

    // W2: running cumulative sum (salesAcc / audiAcc).
    "win_cumsum" -> ((s, d) =>
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("cum_price",
          round(sum("o_totalprice")
            .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .orderBy("o_custkey", "o_orderkey")),

    // W3: rank + row_number within a period (daily top-10 ranking shape);
    // unique tiebreak key keeps both engines deterministic.
    // Scale hardening: month cardinality is low (~80 partitions here), so a
    // straight month-partitioned window funnels a month of raw orders into
    // one task at 100×. A partition-local rank()<=5 prune runs first: any
    // row with global rank<=5 has at most 4 better rows in its own input
    // partition too, so local rank() (NOT row_number — ties must survive)
    // keeps every candidate, and the month window then sorts only
    // <=5×partitions survivors. row_number stays exact because every row
    // ordered before a survivor is itself a survivor.
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy("order_month")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val base = orders(s, d)
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .select("order_month", "o_orderkey", "o_totalprice")
      val pruned = base
        .withColumn("part", spark_partition_id())
        .withColumn("lrk", rank().over(Window
          .partitionBy("order_month", "part")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("lrk") <= 5)
        .drop("part", "lrk")
      pruned
        .withColumn("rnk", rank().over(w))
        .withColumn("rn", row_number().over(w))
        .filter(col("rnk") <= 5)
        .orderBy("order_month", "rnk", "o_orderkey")
    }),

    // W4 + H11: share-of-total (salesShare = sales / day total).
    "win_share" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("day_share",
          round(col("o_totalprice") /
            sum("o_totalprice").over(Window.partitionBy("o_orderdate")), 6))
        .orderBy("o_orderkey")),

    // W5: NEW/OLD chart-entry flag (rankOldAndNew).
    "win_new_entry" -> ((s, d) =>
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("entry_flag",
          when(lag("o_orderkey", 1).over(byCust).isNull, "NEW").otherwise("OLD"))
        .orderBy("o_custkey", "o_orderkey")),

    // W3 extension: first/last/nth value over the per-customer order
    // history — the "opening vs latest vs second order" comparison shape.
    "win_firstlast" -> ((s, d) => {
      val wAll = byCust.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("first_price", first("o_totalprice").over(wAll))
        .withColumn("last_price", last("o_totalprice").over(wAll))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(wAll))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist over
    // the per-month price distribution (quartile bucketing for tiles).
    // pct_rank/cume are emitted UNROUNDED: both are ratios of identical
    // integers (rank/n), so the IEEE division is bit-identical in both
    // engines — while round(…,6) diverges whenever k/n lands on a 6dp
    // midpoint (e.g. 41/640 = 0.0640625), which real partition sizes DO
    // produce (caught by the r8 sf1ish differential sweep; sf0.1 group
    // sizes happened to miss every midpoint).
    "win_ntile" -> ((s, d) => {
      val w = Window.partitionBy("order_month")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .select("order_month", "o_orderkey", "o_totalprice")
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy("order_month", "o_orderkey")
    }),

    // Gaps-and-islands sessionization in BATCH: lag-gap break flag, running
    // sum for the session id, then per-session aggregates — the window-
    // function twin of `stream_session` (which uses session_window and can
    // only carry count/min/max through the session state). This form attaches
    // arbitrary aggregates (here the exact-decimal value sum) to each
    // session. Same 30-minute half-open gap rule as the streaming query.
    // Scale: both windows and the final groupBy partition on user_id —
    // high-cardinality, one shuffle, no global state.
    "sessionize_batch" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("brk",
          when(lag("ts", 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w))
              >= 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(unix_micros(min("ts")).as("sess_start_us"),
          unix_micros(max("ts")).as("sess_end_us"),
          count(lit(1)).as("n_events"),
          dsum(col("value"), 4).as("sum_value"))
        .drop("sid")
        .orderBy("user_id", "sess_start_us")
    }),

    // Interval RANGE frame per key: trailing-30-day order count and spend
    // for every order, over the customer's own history. Unlike the ROWS
    // frames above, the frame is defined on the time axis (day numbers), so
    // sparse/bursty histories window correctly. Decimal accumulation inside
    // the frame keeps the sum order-independent; day numbers (not dates)
    // because Spark's rangeBetween needs a numeric order key.
    "win_range_30d" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("d_num")
        .rangeBetween(-29, 0)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("d_num",
          datediff(col("o_orderdate"), to_date(lit("1970-01-01"))))
        .withColumn("n_30d", count(lit(1)).over(w))
        .withColumn("spend_30d",
          round(exactSum(col("o_totalprice")).over(w), 2).cast("double"))
        .drop("d_num")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W7: trailing-7-day revenue trendline (README.md:193-196). Daily
    // pre-aggregation first, then a RANGE window over day numbers. The daily
    // sum accumulates as decimal (exactSum) and the trailing window sums the
    // decimal — both stay partition-order-independent; one round at the end.
    "win_trailing7" -> ((s, d) => {
      val daily = lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("ship_d"))
        .agg(exactSum(col("l_extendedprice")).as("rev"))
        .withColumn("d_num", datediff(col("ship_d"), to_date(lit("1970-01-01"))))
      daily
        .withColumn("rev7",
          round(sum("rev").over(Window.orderBy("d_num").rangeBetween(-6, 0)), 2)
            .cast("double"))
        .select(col("ship_d"), round(col("rev"), 2).cast("double").as("rev"),
          col("rev7"))
        .orderBy("ship_d")
    }),

    // Funnel conversion (view → click → purchase, strictly ordered in
    // event time, first week of the corpus): the product-analytics shape
    // behind every "conversion dashboard" — how many users reach each
    // stage, where stage N+1 must happen AFTER the user's first stage-N
    // event. Three user-keyed min-aggregations chained by joins on
    // user_id (the same shuffle key each time — one exchange reused);
    // stage totals are 1-row frames crossed into the summary, the same
    // model-parameter BNLJ shape as mix_resample. Timestamps compare
    // exactly (microsecond longs) in both engines.
    "funnel_conversion" -> ((s, d) => {
      val ev = events(s, d)
        .filter(col("ts") < to_timestamp(lit("2024-01-08")))
        .select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("tv"))
      val c = ev.join(v, "user_id")
        .filter(col("event_type") === "click" && col("ts") > col("tv"))
        .groupBy("user_id").agg(min("ts").as("tc"))
      val p = ev.join(c, "user_id")
        .filter(col("event_type") === "purchase" && col("ts") > col("tc"))
        .groupBy("user_id").agg(min("ts").as("tp"))
      // raw IEEE division, no round: count ratios have DYADIC
      // denominators that land exactly on rounding midpoints (the
      // win_ntile 41/640 class caught by the r8 sf1ish sweep) — the
      // unrounded quotient of identical integers is bit-identical in
      // both engines, a re-round only adds a divergence surface
      val rate = (n: org.apache.spark.sql.Column,
                  of: org.apache.spark.sql.Column) =>
        n.cast("double") / of
      ev.agg(countDistinct("user_id").as("n_users"))
        .crossJoin(v.agg(count(lit(1)).as("n_view")))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select(col("n_users"), col("n_view"), col("n_click"),
          col("n_purchase"),
          rate(col("n_view"), col("n_users")).as("view_rate"),
          rate(col("n_click"), col("n_view")).as("click_through"),
          rate(col("n_purchase"), col("n_click")).as("purchase_through"))
    }),

    // Day-N cohort retention — the product-analytics matrix beside
    // funnel_conversion and customer_rfm: users cohorted by FIRST-seen
    // day, each later active day counted as (cohort, day_n) with the
    // retained share vs the cohort's size. Scale: first-seen and
    // active-day sets are per-user aggregates (user_id shuffle, linear);
    // the matrix aggregate is |cohorts|×|days| ≪ facts; cohort sizes are
    // a broadcast model parameter. The share divides two identical
    // integers in both engines (IEEE-exact, no rounding needed).
    "cohort_retention" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
      val sizes = first.groupBy("cohort")
        .agg(countDistinct("user_id").as("n_cohort"))
      ev.distinct().join(first, Seq("user_id"))
        .select(col("cohort"),
          // bigint to match DuckDB's date_diff return type exactly
          datediff(col("day"), col("cohort")).cast("long").as("day_n"),
          col("user_id"))
        .groupBy("cohort", "day_n")
        .agg(countDistinct("user_id").as("n_active"))
        .join(broadcast(sizes), Seq("cohort"))
        .select(col("cohort"), col("day_n"), col("n_active"),
          col("n_cohort"),
          (col("n_active").cast("double") / col("n_cohort"))
            .as("retained_share"))
        .orderBy("cohort", "day_n")
    }),

    // Event-transition counts (the user-journey Markov matrix): each
    // user's event sequence contributes (previous type → type) edges;
    // P(cur|prev) comes from a window over the |types|² aggregate, never
    // the raw events. Ordering ties on identical timestamps break by
    // event_id, so the lag is deterministic in both engines. Scale: the
    // lag window partitions by user (distributed state), the transition
    // aggregate is 25 rows at any corpus size.
    "event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("cur"))
        .agg(count(lit(1)).as("n"))
      tr.withColumn("p_cur_given_prev",
          col("n").cast("double") /
            sum("n").over(Window.partitionBy("prev")))
        .orderBy("prev", "cur")
    }),

    // Last-touch attribution: each purchase credits the user's most recent
    // PRECEDING non-purchase event — the IGNORE-NULLS carry-forward (LOCF)
    // window shape, the other standard gaps-and-islands tool beside
    // sessionize_batch's break flag. The carry window is per-user
    // (high-cardinality, distributed state); the channel rollup is
    // ≤|event types| rows and the share window runs over THAT aggregate,
    // never the raw events. share is the unrounded quotient of identical
    // integers (the funnel_conversion contract).
    "attribution_last_touch" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("channel",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("channel").isNotNull)
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value"), 4).as("sum_value"))
        .withColumn("share",
          col("n_purchases").cast("double") /
            sum("n_purchases").over(Window.partitionBy()))
        .orderBy("channel")
    }),

    // Rolling distinct count — behavioral variety over the user's last 10
    // events. Spark has no DISTINCT window aggregate; size(collect_set)
    // over the ROWS frame is the idiomatic spelling and bounds frame state
    // at ≤10 elements per row. Partitioned by user — distributed state.
    "win_distinct_rolling" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, 0)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("k_types_10",
          size(collect_set("event_type").over(w)).cast("long"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("k_types_10"))
        .orderBy("user_id", "event_id")
    }),

    // Rolling median of the user's last 9 values — the robust trend line
    // a rolling MEAN loses to one outlier tick. No median window function
    // exists in Spark; sort_array(collect_list) over the ROWS frame keeps
    // state at ≤9 elements per row, and the even-count interpolation is
    // spelled (a+b)/2 EXPLICITLY in both engines (an engine-native median
    // may interpolate as a+(b−a)/2 — a different IEEE result). Partitioned
    // by user: distributed state.
    "win_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-8, 0)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("arr", sort_array(collect_list("value").over(w)))
        .withColumn("n", size(col("arr")))
        .withColumn("med9",
          when(col("n") % 2 === 1,
            element_at(col("arr"), ((col("n") + 1) / 2).cast("int")))
            .otherwise(
              (element_at(col("arr"), (col("n") / 2).cast("int")) +
                element_at(col("arr"),
                  (col("n") / 2).cast("int") + 1)) / 2))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("med9"))
        .orderBy("user_id", "event_id")
    }),

    // Consecutive-day activity streaks — the other canonical
    // gaps-and-islands form beside sessionize_batch's break flag: on the
    // per-(user, day) DISTINCT grid, day_number − row_number is constant
    // exactly within a consecutive run, so one subtraction labels the
    // islands and a plain groupBy collapses them to (start, end, length)
    // ranges. Everything partitions by user (distributed window state);
    // the distinct grid is ≤ users×days, far below raw events.
    "user_streaks" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
        .withColumn("island",
          datediff(col("day"), to_date(lit("1970-01-01"))) -
            row_number().over(w))
        .groupBy("user_id", "island")
        .agg(min("day").as("streak_start"), max("day").as("streak_end"),
          count(lit(1)).as("len"))
        .drop("island")
        .orderBy("user_id", "streak_start")
    }),

    // Truncated EWMA (α=1/2, 8 taps) over the daily-revenue series — the
    // exponential-smoothing twin of win_trailing7's flat trailing sum.
    // Dyadic decay is deliberate: 2^-k weights scale a double's EXPONENT
    // only (multiplication is exact, zero rounding), the 8-term sums fold
    // left-to-right in the same order in both engines, and the final
    // division of two identical doubles is bit-equal — so the smoothed
    // series needs no round() at all (the win_ntile midpoint lesson). The
    // head of the series renormalizes over the taps that exist. Global
    // window over the daily PRE-AGGREGATE (win_trailing7's documented
    // bound: calendar cardinality, not fact cardinality).
    "ts_ewma" -> ((s, d) => {
      val w = Window.orderBy("ship_d")
      val daily = lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("ship_d"))
        .agg(round(exactSum(col("l_extendedprice")), 2).cast("double")
          .as("rev"))
      val taps = (0 to 7).map { j =>
        val wj = lit(math.pow(0.5, j + 1))
        val x = if (j == 0) col("rev") else lag("rev", j).over(w)
        (coalesce(x * wj, lit(0.0)), when(x.isNotNull, wj).otherwise(0.0))
      }
      daily
        .withColumn("ewma",
          taps.map(_._1).reduce(_ + _) / taps.map(_._2).reduce(_ + _))
        .orderBy("ship_d")
    })
  )

  val oracles: Map[String, String] = Map(
    "win_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |lag(o_totalprice) OVER w AS prev_price,
        |o_totalprice - lag(o_totalprice) OVER w AS delta,
        |round((o_totalprice / lag(o_totalprice) OVER w - 1) * 100, 4) AS pct_change
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |lead(o_totalprice) OVER w AS next_price,
        |lead(o_totalprice) OVER w - o_totalprice AS next_delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_cumsum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |round(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |ORDER BY o_orderdate, o_orderkey
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_rank" ->
      """SELECT * FROM (
        |SELECT strftime(o_orderdate,'%Y-%m') AS order_month, o_orderkey, o_totalprice,
        |rank() OVER w AS rnk, row_number() OVER w AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY strftime(o_orderdate,'%Y-%m')
        |ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rnk <= 5 ORDER BY order_month, rnk, o_orderkey""".stripMargin,
    "win_share" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice,
        |round(o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_orderdate), 6)
        |AS day_share
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_new_entry" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |CASE WHEN lag(o_orderkey) OVER (PARTITION BY o_custkey
        |ORDER BY o_orderdate, o_orderkey) IS NULL THEN 'NEW' ELSE 'OLD' END AS entry_flag
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_firstlast" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |first_value(o_totalprice) OVER w AS first_price,
        |last_value(o_totalprice) OVER w AS last_price,
        |nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_ntile" ->
      """SELECT strftime(o_orderdate,'%Y-%m') AS order_month, o_orderkey, o_totalprice,
        |ntile(4) OVER w AS quartile,
        |percent_rank() OVER w AS pct_rank,
        |cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY strftime(o_orderdate,'%Y-%m')
        |ORDER BY o_totalprice, o_orderkey)
        |ORDER BY order_month, o_orderkey""".stripMargin,
    // Same break rule as stream_session's oracle (half-open session: a gap
    // of exactly 30 min starts a new session); event_id tiebreaks equal
    // timestamps so lag/cumsum are deterministic in both engines.
    "sessionize_batch" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
        |epoch_us(max(ts)) AS sess_end_us, COUNT(*) AS n_events,
        |CAST(round(SUM(CAST(value AS DECIMAL(30,8))),4) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin,
    "win_range_30d" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |COUNT(*) OVER w AS n_30d,
        |CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w, 2) AS DOUBLE)
        |  AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
        |RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_trailing7" ->
      """WITH daily AS (
        |SELECT CAST(l_shipdate AS DATE) AS ship_d,
        |SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS rev,
        |date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d_num
        |FROM lineitem GROUP BY 1, 3)
        |SELECT ship_d, CAST(round(rev,2) AS DOUBLE) AS rev,
        |CAST(round(SUM(rev) OVER (ORDER BY d_num
        |RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rev7
        |FROM daily ORDER BY ship_d""".stripMargin,
    "funnel_conversion" ->
      """WITH w AS (SELECT user_id, event_type, ts FROM events
        |  WHERE ts < TIMESTAMP '2024-01-08'),
        |v AS (SELECT user_id, min(ts) AS tv FROM w
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS tc FROM w e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts > tv GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS tp FROM w e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > tc GROUP BY 1)
        |SELECT (SELECT count(DISTINCT user_id) FROM w) AS n_users,
        |  (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase,
        |  CAST((SELECT count(*) FROM v) AS DOUBLE)
        |    / (SELECT count(DISTINCT user_id) FROM w) AS view_rate,
        |  CAST((SELECT count(*) FROM c) AS DOUBLE)
        |    / (SELECT count(*) FROM v) AS click_through,
        |  CAST((SELECT count(*) FROM p) AS DOUBLE)
        |    / (SELECT count(*) FROM c) AS purchase_through""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1),
        |sz AS (SELECT cohort, count(DISTINCT user_id) AS n_cohort
        |  FROM f GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, day FROM ev),
        |m AS (SELECT cohort, date_diff('day', cohort, day) AS day_n,
        |    count(DISTINCT a.user_id) AS n_active
        |  FROM act a JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort, day_n, n_active, n_cohort,
        |  CAST(n_active AS DOUBLE) / n_cohort AS retained_share
        |FROM m JOIN sz ON m.cohort = sz.cohort
        |ORDER BY m.cohort, day_n""".stripMargin,
    "event_transitions" ->
      """WITH o AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev,
        |    event_type AS cur
        |  FROM events),
        |t AS (SELECT prev, cur, count(*) AS n FROM o
        |  WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, cur, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev)
        |    AS p_cur_given_prev
        |FROM t ORDER BY prev, cur""".stripMargin,
    "attribution_last_touch" ->
      """WITH a AS (SELECT user_id, event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS channel
        |  FROM events),
        |c AS (SELECT channel, count(*) AS n_purchases,
        |    count(DISTINCT user_id) AS n_users,
        |    CAST(round(SUM(CAST(value AS DECIMAL(30,8))),4) AS DOUBLE)
        |      AS sum_value
        |  FROM a WHERE event_type = 'purchase' AND channel IS NOT NULL
        |  GROUP BY 1)
        |SELECT channel, n_purchases, n_users, sum_value,
        |  CAST(n_purchases AS DOUBLE) / sum(n_purchases) OVER () AS share
        |FROM c ORDER BY channel""".stripMargin,
    "win_distinct_rolling" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |count(DISTINCT event_type) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS k_types_10
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    // Mirror construction: list window + explicit (a+b)/2 interpolation,
    // NOT DuckDB's native median() (whose interpolation formula is not
    // contractually (a+b)/2).
    "win_rolling_median" ->
      """WITH x AS (SELECT user_id, event_id, ts,
        |    list_sort(list(value) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM events),
        |y AS (SELECT user_id, event_id, ts, arr, len(arr) AS n FROM x)
        |SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN n % 2 = 1 THEN arr[(n + 1) // 2]
        |       ELSE (arr[n // 2] + arr[n // 2 + 1]) / 2 END AS med9
        |FROM y ORDER BY user_id, event_id""".stripMargin,
    "user_streaks" ->
      """WITH g AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |i AS (SELECT user_id, day,
        |    date_diff('day', DATE '1970-01-01', day) -
        |      row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM g)
        |SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
        |  count(*) AS len
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, streak_start""".stripMargin,
    // Same left-to-right tap order as the Spark fold; dyadic weights make
    // every multiply exact, so the unrounded quotient is bit-identical.
    "ts_ewma" -> {
      val num = (1 to 7).foldLeft("rev * CAST(0.5 AS DOUBLE)") {
        (acc, j) =>
          s"$acc + coalesce(r$j * CAST(${math.pow(0.5, j + 1)} AS DOUBLE), 0)"
      }
      val den = (1 to 7).foldLeft("CAST(0.5 AS DOUBLE)") { (acc, j) =>
        s"$acc + CASE WHEN r$j IS NOT NULL " +
          s"THEN CAST(${math.pow(0.5, j + 1)} AS DOUBLE) ELSE 0 END"
      }
      val lags = (1 to 7).map(j => s"lag(rev, $j) OVER w AS r$j")
        .mkString(", ")
      s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS ship_d,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(30,8))),2)
        |    AS DOUBLE) AS rev
        |  FROM lineitem GROUP BY 1),
        |l AS (SELECT ship_d, rev, $lags
        |  FROM daily WINDOW w AS (ORDER BY ship_d))
        |SELECT ship_d, rev, ($num) / ($den) AS ewma
        |FROM l ORDER BY ship_d""".stripMargin
    }
  )
}
