package graft.ops

import graft.Q
import graft.Tables._
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.H): string split, date
  * parse/format/arithmetic, casts, replace/concat, CASE bucketing.
  *
  * Reference semantics:
  *  - H1 split: `showRange "A~B" → first date` (daily_csv_pipeline.py:100-102,
  *    daily_parquet_pipeline.py:80)
  *  - H2/H3 parse/format: `pd.to_datetime(...,'%Y%m%d')`
  *    (daily_parquet_pipeline.py:75-80), `strftime("%Y%m%d")` (csv:192)
  *  - H4 date arithmetic + K6 date-list generation: `now()-timedelta(1)`,
  *    9-day range (dbt_dags.py:13-17)
  *  - H5 casts: `astype('datetime64[ns]')` (parquet:90-93)
  *  - H6/H7 replace/concat: Jinja `replace('_box_office','')`
  *    (box_office_data.sql:10-13), f-string table names (csv:193-195)
  *  - H9 season bucketing: README.md:205-220
  *
  * All functions are built-in `org.apache.spark.sql.functions` — codegen'd
  * inside WholeStageCodegen, no UDFs in the hot path.
  */
object Scalars {

  val queries: Map[String, Q] = Map(
    // H1: split + element access, including the exact "A~B" range shape.
    "str_split" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          split(col("o_orderpriority"), "-").getItem(0).as("prio_num"),
          split(col("o_orderpriority"), "-").getItem(1).as("prio_name"),
          split(concat(date_format(col("o_orderdate"), "yyyyMMdd"), lit("~"),
            date_format(col("o_orderdate"), "yyyyMMdd")), "~")
            .getItem(0).as("range_first"))
        .orderBy("o_orderkey")),

    // H2: yyyyMMdd string → DATE (round-trip through the reference's format).
    "date_parse" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          to_date(date_format(col("o_orderdate"), "yyyyMMdd"), "yyyyMMdd").as("d"))
        .orderBy("o_orderkey")),

    // H3: DATE → formatted strings.
    "date_format_q" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyyMMdd").as("d8"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy("o_orderkey")),

    // H4 + K6 + H7: generate the dbt date list (yesterday-8 … yesterday,
    // dbt_dags.py:13-17) fully in-plan — sequence + explode, then the
    // f-string table name (csv:193-195). Constant-folded by Catalyst.
    "date_seq" -> ((s, _) =>
      s.range(1)
        .select(explode(sequence(
          to_date(lit("2025-01-07")), to_date(lit("2025-01-15")),
          expr("interval 1 day"))).as("d"))
        .select(col("d"),
          concat(date_format(col("d"), "yyyyMMdd"), lit("_box_office")).as("table_name"))
        .orderBy("d")),

    // H4/H8 extension: the wider calendar battery (quarter/last_day/
    // add_months/date_add/whole-month diff).
    "date_funcs" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          last_day(col("o_orderdate")).as("last_d"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30d"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) -
            (lit(1995) * 12 + 1)).as("months_since_jan95"))
        .orderBy("o_orderkey")),

    // Math battery over lineitem — transcendentals rounded at 6 to absorb
    // libm last-ulp differences across engines.
    "math_funcs" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - lit(0.05)).as("abs_d"),
          ceil(col("l_quantity")).as("ceil_q"),
          floor(col("l_quantity")).as("floor_q"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(log(col("l_extendedprice") + 1), 6).as("ln_p"),
          round(log10(col("l_extendedprice") + 1), 6).as("log10_p"),
          round(pow(col("l_discount") + 1, 3), 6).as("pow_d"),
          signum(col("l_discount") - col("l_tax")).cast("int").as("sign_dt"),
          greatest(col("l_discount"), col("l_tax")).as("max_dt"),
          least(col("l_discount"), col("l_tax")).as("min_dt"))
        .orderBy("l_orderkey", "l_linenumber")),

    // H5: cast matrix. Note double→int uses floor() first: Spark truncates
    // toward zero while DuckDB rounds, so the portable spelling is explicit.
    "cast_types" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_shipdate").cast("date").as("ship_d"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_linenumber").cast("double").as("line_d"))
        .orderBy("l_orderkey", "l_linenumber")),

    // H6: replace (regexp_replace replaces all occurrences, like Jinja's).
    "str_replace" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "Customer#", "C#").as("short_name"),
          regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("devoweled"))
        .orderBy("c_custkey")),

    // H7: concat + printf-style templating.
    "str_concat" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          concat(col("c_name"), lit("|"), col("c_mktsegment")).as("tagged"),
          format_string("cust_%07d", col("c_custkey")).as("padded"))
        .orderBy("c_custkey")),

    // H6/H7 extension: the wider string-function battery (pad/trim/case/
    // substring/position/translate) every BI layer leans on.
    "str_funcs" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded8"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
          upper(col("c_mktsegment")).as("upper_seg"),
          lower(col("c_name")).as("lower_name"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          instr(col("c_name"), "#").as("hash_pos"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("lowered_vowels"),
          reverse(col("c_mktsegment")).as("rev_seg"),
          length(col("c_name")).as("name_len"))
        .orderBy("c_custkey")),

    // Regex battery: extract/like/replace-with-backrefs — the pattern
    // toolkit behind log and identifier munging.
    "regex_funcs" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "#(\\d+)", 1).as("cust_num"),
          col("c_name").rlike("[0-9]{3,}").as("has_3digits"),
          regexp_replace(col("c_name"), "(Customer)#", "$1-").as("dashed"))
        .orderBy("c_custkey")),

    // H9: season bucketing CASE expression + aggregate (README.md:205-215).
    "case_season" -> ((s, d) =>
      orders(s, d)
        .groupBy(
          when(month(col("o_orderdate")).isin(12, 1, 2), "winter")
            .when(month(col("o_orderdate")).isin(3, 4, 5), "spring")
            .when(month(col("o_orderdate")).isin(6, 7, 8), "summer")
            .otherwise("fall").as("season"))
        .agg(dsum(col("o_totalprice"), 2).as("sum_price"), count(lit(1)).as("n"))
        .orderBy("season")),

    // Array/collection function battery over the token arrays: size,
    // distinct, slice, element_at, membership/position, order-insensitive
    // content hash — the complex-type surface a document pipeline leans on
    // constantly. All built-ins, all codegen'd; position semantics are
    // aligned cross-engine (Spark's array_position returns 0 when absent,
    // DuckDB's list_position NULL → coalesce in the oracle).
    "array_funcs" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), toks.as("w"))
        .select(col("doc_id"),
          size(col("w")).as("n"),
          size(array_distinct(col("w"))).as("n_distinct"),
          concat_ws("_", slice(col("w"), 1, 3)).as("first3"),
          element_at(col("w"), -1).as("last_tok"),
          array_contains(col("w"), "the").cast("int").as("has_the"),
          array_position(col("w"), "the").as("the_pos"),
          substring(sha2(concat_ws(" ", array_sort(col("w"))), 256), 1, 16)
            .as("sorted_hash"))
        .orderBy("doc_id")),

    // MAP-type battery — the complex-type surface array_funcs leaves out:
    // each doc's term-frequency MAP built with map_from_entries over the
    // tok-sorted entry array (deterministic key order), then probed with
    // map_keys / map_values / element_at(absent key → null) / map_filter
    // / the aggregate() HOF folding the value list. Every OUTPUT is a
    // scalar, so the oracle can compute the same facts relationally (the
    // contract is the result, not the map representation — DuckDB's MAP
    // extraction semantics changed across versions, so its mirror stays
    // on the tf table). Scale: one (doc, tok) aggregate + one per-doc
    // collect of that doc's OWN vocabulary — bounded by doc length, the
    // same per-doc state text_entropy carries.
    "map_funcs" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      tf.groupBy("doc_id")
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("tok"), col("c"))))).as("m"))
        .select(col("doc_id"),
          size(map_keys(col("m"))).as("n_keys"),
          element_at(col("m"), "the").as("c_the"),
          aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x)
            .as("n_tok"),
          size(map_filter(col("m"), (_, v) => v >= 3)).as("n_repeated"))
        .orderBy("doc_id")
    }),

    // UNPIVOT / melt: the four lineitem measures to long form, then one
    // aggregate per measure — the wide→long inverse of the D3 pivot. The
    // unpivot itself is a zero-shuffle Expand (4 output rows per input
    // row, map-side); only the 4-group aggregate exchanges.
    "unpivot_melt" -> ((s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
        .orderBy("measure"))
  )

  val oracles: Map[String, String] = Map(
    "str_split" ->
      """SELECT o_orderkey,
        |string_split(o_orderpriority,'-')[1] AS prio_num,
        |string_split(o_orderpriority,'-')[2] AS prio_name,
        |string_split(strftime(o_orderdate,'%Y%m%d') || '~' || strftime(o_orderdate,'%Y%m%d'),'~')[1] AS range_first
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "date_parse" ->
      """SELECT o_orderkey, CAST(strptime(strftime(o_orderdate,'%Y%m%d'),'%Y%m%d') AS DATE) AS d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "date_format_q" ->
      """SELECT o_orderkey, strftime(o_orderdate,'%Y%m%d') AS d8,
        |strftime(o_orderdate,'%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "date_seq" ->
      """SELECT CAST(u AS DATE) AS d, strftime(u,'%Y%m%d') || '_box_office' AS table_name
        |FROM (SELECT unnest(generate_series(DATE '2025-01-07', DATE '2025-01-15', INTERVAL 1 DAY)) AS u)
        |ORDER BY d""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |year(o_orderdate) AS yr, quarter(o_orderdate) AS q,
        |month(o_orderdate) AS m, day(o_orderdate) AS dom,
        |dayofyear(o_orderdate) AS doy,
        |CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS last_d,
        |CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30d,
        |CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |year(o_orderdate)*12 + month(o_orderdate) - (1995*12 + 1) AS months_since_jan95
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |abs(l_discount - 0.05) AS abs_d,
        |CAST(ceil(l_quantity) AS BIGINT) AS ceil_q,
        |CAST(floor(l_quantity) AS BIGINT) AS floor_q,
        |round(sqrt(l_extendedprice), 6) AS sqrt_p,
        |round(ln(l_extendedprice + 1), 6) AS ln_p,
        |round(log10(l_extendedprice + 1), 6) AS log10_p,
        |round(pow(l_discount + 1, 3), 6) AS pow_d,
        |CAST(sign(l_discount - l_tax) AS INTEGER) AS sign_dt,
        |greatest(l_discount, l_tax) AS max_dt,
        |least(l_discount, l_tax) AS min_dt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "cast_types" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        |CAST(l_shipdate AS DATE) AS ship_d,
        |CAST(l_orderkey AS VARCHAR) AS key_str,
        |CAST(l_linenumber AS DOUBLE) AS line_d
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "str_replace" ->
      """SELECT c_custkey,
        |regexp_replace(c_name, 'Customer#', 'C#', 'g') AS short_name,
        |regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devoweled
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "str_concat" ->
      """SELECT c_custkey, c_name || '|' || c_mktsegment AS tagged,
        |printf('cust_%07d', c_custkey) AS padded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "str_funcs" ->
      """SELECT c_custkey,
        |lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded8,
        |trim('  ' || c_mktsegment || '  ') AS trimmed,
        |upper(c_mktsegment) AS upper_seg,
        |lower(c_name) AS lower_name,
        |substring(c_name, 1, 8) AS prefix8,
        |instr(c_name, '#') AS hash_pos,
        |translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
        |reverse(c_mktsegment) AS rev_seg,
        |length(c_name) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "regex_funcs" ->
      """SELECT c_custkey,
        |regexp_extract(c_name, '#(\d+)', 1) AS cust_num,
        |regexp_matches(c_name, '[0-9]{3,}') AS has_3digits,
        |regexp_replace(c_name, '(Customer)#', '\1-', 'g') AS dashed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "case_season" ->
      """SELECT CASE WHEN month(o_orderdate) IN (12,1,2) THEN 'winter'
        |WHEN month(o_orderdate) IN (3,4,5) THEN 'spring'
        |WHEN month(o_orderdate) IN (6,7,8) THEN 'summer'
        |ELSE 'fall' END AS season,
        |CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))),2) AS DOUBLE) AS sum_price, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "array_funcs" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS w FROM documents)
        |SELECT doc_id,
        |  CAST(len(w) AS INT) AS n,
        |  CAST(len(list_distinct(w)) AS INT) AS n_distinct,
        |  array_to_string(w[1:3], '_') AS first3,
        |  w[-1] AS last_tok,
        |  CAST(list_contains(w, 'the') AS INT) AS has_the,
        |  CAST(coalesce(list_position(w, 'the'), 0) AS BIGINT) AS the_pos,
        |  substr(sha256(array_to_string(list_sort(w), ' ')), 1, 16)
        |    AS sorted_hash
        |FROM t ORDER BY doc_id""".stripMargin,
    // Relational mirror of the map probes (see the query's scaladoc):
    // same facts from the (doc, tok, c) tf table.
    "map_funcs" ->
      s"""WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest($dToks) AS tok FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(count(*) AS INT) AS n_keys,
        |  max(CASE WHEN tok = 'the' THEN c END) AS c_the,
        |  CAST(sum(c) AS BIGINT) AS n_tok,
        |  CAST(count(*) FILTER (c >= 3) AS INT) AS n_repeated
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "unpivot_melt" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n,
        |CAST(round(SUM(CAST(value AS DECIMAL(30,8))),4) AS DOUBLE) AS sum_value
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
