package graft.ops

import graft.Q
import graft.Tables.{customer, documents, embeddings, nation, orders}
import graft.plans.GraftExtensions

/** SQL-TEXT entry path (SURVEY §2 growth axis, r13): the board is built
  * with the DataFrame API, but the reference's transform layer is dbt —
  * its users arrive with SQL TEXT, so the parser/analyzer surface is a
  * real product surface and deserves declared, oracle-checked coverage
  * of its own. A handful of queries already route through `spark.sql`
  * for engine reasons (agg_rollup, agg_grouping_sets, filter_exists);
  * this module adds the parser features none of them touch: the PIVOT
  * and UNPIVOT clauses, the named-WINDOW clause with explicit ROWS and
  * RANGE frames, LATERAL VIEW explode (the UDTF surface), inline VALUES
  * relations, and the session-extension function registry (`graft_dot`
  * called from SQL text, not a Column).
  *
  * Each query creates temp views (`sqv_*` prefix — session-scoped
  * metadata only, no materialization) and runs one SQL string. Results
  * are deliberately re-expressions of already-proven semantics
  * (pivot ≡ agg_pivot's family, wordcount ≡ text_wordcount) so a
  * mismatch here isolates a PARSER/ANALYZER divergence, not operator
  * logic. Scale posture inherits from the underlying plans: SQL text
  * and DataFrame calls build the same logical plan, so pushdown,
  * partial aggregation, and broadcast selection are identical — which
  * is exactly the claim these queries pin.
  */
object SqlSurface {

  /** The M10 enrichment SELECT (orders → customer → nation, revenue per
    * nation — the C1 join a dashboard SQL user writes; README.md:205-220
    * is the reference's genre/season enrichment this mirrors), with a
    * slot for an optional hint-comment list. One string, two plans:
    * the declared query runs it WITH `/*+ BROADCAST(n), REPARTITION(8) */`
    * and the oracle/PlanAuditSpec run it bare — hints must never change
    * results, only the physical plan. The hints sit in the inner query
    * block so the REPARTITION lands below the outer ORDER BY (output
    * order is a display property; the repartition is the write-fan-out
    * knob users pair with it).
    */
  private[graft] def joinHintSelect(hints: String): String =
    s"""SELECT n_name, sum_price, n_orders FROM (
      |  SELECT $hints n_name,
      |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
      |      AS DOUBLE) AS sum_price,
      |    COUNT(*) AS n_orders
      |  FROM sqv_orders o
      |  JOIN sqv_customer c ON o.o_custkey = c.c_custkey
      |  JOIN sqv_nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY n_name)
      |ORDER BY n_name""".stripMargin

  val queries: Map[String, Q] = Map(

    // SQL-text join hints (M10, r15) — the parser knob a dbt/SQL user
    // actually turns when the optimizer guesses wrong: `/*+ BROADCAST
    // (dim) */` pins the map-side join when stats under-estimate a
    // filtered dimension, and `/*+ REPARTITION(n) */` is its shuffle
    // sibling (output fan-out control before a write). The oracle runs
    // the UNHINTED text — a hint that changes results is a bug by
    // definition — and the TEETH live in PlanAuditSpec: with the
    // broadcast threshold forced to -1 (stats alone say sort-merge),
    // the hinted plan must carry a BroadcastHashJoin on nation and a
    // RoundRobin(8) exchange, the unhinted plan neither. Scale posture:
    // identical to join_broadcast (C1) — nation is a fixed-size dim, the
    // hint rides the scan stage; at 100 TB the same text is exactly what
    // a user ships when AQE's estimate misses.
    "sql_join_hints" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      customer(s, d).createOrReplaceTempView("sqv_customer")
      nation(s, d).createOrReplaceTempView("sqv_nation")
      s.sql(joinHintSelect("/*+ BROADCAST(n), REPARTITION(8) */"))
    }),

    // The PIVOT clause (parser rule unique to SQL text — the DataFrame
    // twin is RelationalGroupedDataset.pivot, exercised by agg_pivot).
    // Cells sum disjoint row subsets through DECIMAL(30,8), so the
    // pivoted totals are partition-order independent; absent cells are
    // NULL in both engines.
    "sql_pivot" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""SELECT * FROM (
        |  SELECT o_orderpriority, o_orderstatus, o_totalprice
        |  FROM sqv_orders)
        |PIVOT (
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
        |  FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        |ORDER BY o_orderpriority""".stripMargin)
    }),

    // The UNPIVOT clause (Spark 3.4+ parser rule): wide metrics to long
    // (metric, val) rows — the melt a feature store runs before a
    // per-metric aggregate. Values are projected to DOUBLE first so the
    // unpivoted column has one type in both engines.
    "sql_unpivot" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("sqv_customer")
      s.sql("""SELECT c_custkey, metric, val FROM (
        |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
        |         CAST(c_nationkey AS DOUBLE) AS nationkey
        |  FROM sqv_customer)
        |UNPIVOT (val FOR metric IN (acctbal, nationkey))
        |ORDER BY c_custkey, metric""".stripMargin)
    }),

    // Named WINDOW clause with an explicit ROWS frame and an explicit
    // RANGE frame side by side — the frame-boundary grammar the
    // DataFrame API spells as rowsBetween/rangeBetween. The ROWS frame
    // orders by the UNIQUE o_orderkey tiebreak (frame membership over
    // date ties is otherwise scan-order dependent — the lineitem LIMIT
    // lesson); the RANGE frame is keyed on the integer o_orderkey, so
    // membership is value-determined in both engines.
    "sql_window_frames" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""SELECT o_custkey, o_orderkey,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w_rows, 2)
        |    AS DOUBLE) AS roll3_price,
        |  COUNT(*) OVER w_range AS n_keyrange
        |FROM sqv_orders
        |WINDOW
        |  w_rows AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  w_range AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
    }),

    // LATERAL VIEW explode — the HiveQL UDTF surface (text_wordcount's
    // parser-path twin; same tokenization contract as [[toks]]/dToks).
    "sql_lateral_view" -> ((s, d) => {
      documents(s, d).createOrReplaceTempView("sqv_documents")
      s.sql("""SELECT tok, COUNT(*) AS n
        |FROM sqv_documents
        |LATERAL VIEW explode(split(lower(text), ' ')) t AS tok
        |GROUP BY tok ORDER BY tok""".stripMargin)
    }),

    // Inline VALUES relation joined to a fact scan — the literal lookup
    // table a SQL user writes instead of a dimension load. The 12-row
    // LocalRelation has exact stats, so the join broadcasts it.
    "sql_values_inline" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""WITH season AS (
        |  SELECT * FROM VALUES
        |    (1,'winter'),(2,'winter'),(3,'spring'),(4,'spring'),
        |    (5,'spring'),(6,'summer'),(7,'summer'),(8,'summer'),
        |    (9,'fall'),(10,'fall'),(11,'fall'),(12,'winter')
        |    AS t(m, season))
        |SELECT season,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
        |    AS sum_price,
        |  COUNT(*) AS n
        |FROM sqv_orders JOIN season ON month(o_orderdate) = m
        |GROUP BY season ORDER BY season""".stripMargin)
    }),

    // INTERSECT / EXCEPT keywords — the set-operation grammar (the E2
    // family is DataFrame-built via .intersect/.except, so no SQL-text
    // query touched these parser rules). Summarized per operation so the
    // result is one deterministic row each.
    "sql_set_ops" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("sqv_customer")
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""WITH i AS (SELECT c_custkey AS k FROM sqv_customer
        |       INTERSECT SELECT o_custkey FROM sqv_orders),
        |     e AS (SELECT c_custkey AS k FROM sqv_customer
        |       EXCEPT SELECT o_custkey FROM sqv_orders)
        |SELECT 'intersect' AS op, COUNT(*) AS n,
        |       MIN(k) AS min_k, MAX(k) AS max_k FROM i
        |UNION ALL
        |SELECT 'except', COUNT(*), MIN(k), MAX(k) FROM e
        |ORDER BY op""".stripMargin)
    }),

    // CTAS — the dbt MATERIALIZATION verb (M8, r14). dbt compiles every
    // model under `+materialized: table` (dbt_project.yml:36) to
    // `CREATE TABLE ... AS SELECT`; the SELECT materialized here mirrors
    // the final pivot of box_office_data.sql:20-31 (MAX(CASE WHEN
    // source THEN metric END) over a pre-aggregated base CTE, grouped by
    // the entity key). The query drives the CTAS statement through the
    // parser, then reads the result back FROM THE SESSION CATALOG
    // (`spark.table`) — pinning the one parser surface §2.M hadn't:
    // DDL + catalog round-trip, not just SELECT analysis. The oracle is
    // the SELECT itself (materialization must not change results).
    // Scale posture: CTAS is scan→agg→parquet write, the same physical
    // plan as the DataFrame save the A-family pins; the managed-table
    // path just adds a catalog entry.
    // Concurrency (r15, closes the r14 review's cross-process race): the
    // table NAME is unique per invocation (UUID), so concurrent harness
    // JVMs sharing the warehouse dir can never delete/overwrite each
    // other's location mid-read — there is no shared state to lock, and
    // the r14 JVM-global `synchronized` is gone with it. The read-back
    // is eagerly materialized (localCheckpoint) and the managed table
    // then DROPPED, purging its warehouse directory, so repeated runs
    // leave nothing behind (a crash between CTAS and DROP strands one
    // uniquely-named directory — swept by the next tmp cleanup, never
    // read by anyone). This is PersistedStore's publish discipline
    // adapted to a throwaway table: uniqueness instead of rename,
    // because the artifact is consumed once, not shared.
    "sql_ctas" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      val tbl = "graft_ctas_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(16)
      s.sql(s"""CREATE TABLE $tbl USING PARQUET AS
        |SELECT o_orderpriority,
        |  MAX(CASE WHEN o_orderstatus = 'O' THEN n END) AS o_n,
        |  MAX(CASE WHEN o_orderstatus = 'O' THEN sales END) AS o_sales,
        |  MAX(CASE WHEN o_orderstatus = 'F' THEN n END) AS f_n,
        |  MAX(CASE WHEN o_orderstatus = 'F' THEN sales END) AS f_sales,
        |  MAX(CASE WHEN o_orderstatus = 'P' THEN n END) AS p_n,
        |  MAX(CASE WHEN o_orderstatus = 'P' THEN sales END) AS p_sales
        |FROM (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS sales
        |  FROM sqv_orders GROUP BY o_orderpriority, o_orderstatus)
        |GROUP BY o_orderpriority""".stripMargin)
      // catalog read-back (the M8 pin), pinned in memory before the drop
      val out = s.table(tbl).localCheckpoint(true)
      s.sql(s"DROP TABLE $tbl") // managed: drop purges the location
      out
    }),

    // WITH RECURSIVE through the parser (M9, r14) — Spark 4.x's
    // recursive-CTE grammar + UnionLoop execution, the last SQL-text
    // surface §2.M hadn't pinned. The recursion runs on MODEL-PARAMETER
    // state, deliberately: the anchor is a full-table aggregate (exact
    // decimal sum per order priority — one map-side-combinable shuffle
    // over the fact table at any scale) and each recursive level is one
    // IEEE multiply per group (5 rows/level, 12 levels — a geometric
    // 12-period decay forecast, ts_forecast_naive's recursive cousin).
    // Fact-ROW recursion is refused by design: Spark 4.1 rejects UNION
    // (distinct) in recursive CTEs (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE,
    // probed), so a graph walk here would be UNION ALL over all bounded
    // WALKS — path-enumeration explosion on any cyclic/dense graph. The
    // engine's scale path for reachability is the Pregel-shaped
    // graph_bfs (per-round min-aggregation caps the frontier), exactly
    // as the M1/agg_pivot split keeps parser pins separate from the
    // operators that carry the 100 TB load.
    // Determinism: the anchor is the decimal-sum contract DIVIDED by the
    // group count — the AVERAGE order value, not the raw sum — because
    // the forecast value's MAGNITUDE must stay scale-invariant: a raw
    // sum grows with the corpus, and at the ~sf1 decade (sums ~5e10)
    // round(x, 6) asks for 17 significant digits, past IEEE double
    // precision, where the two engines legitimately disagree by one ULP
    // (caught by the r14 decade sweep). An average sits at ~1.5e5 at
    // EVERY scale factor, so the display round stays ~11 significant
    // digits deep inside double precision at 100 TB as much as at
    // sf0.001. The division is one IEEE op on an exact decimal-sum image
    // and an exact count; each recursive step is then a SINGLE IEEE
    // multiply by the same literal (no FMA contraction possible), so the
    // 12-step chain is bit-identical cross-engine; round(…,6) only at
    // display.
    "sql_recursive_cte" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""
        |WITH RECURSIVE forecast(o_orderpriority, m, avg_sales) AS (
        |  SELECT o_orderpriority, 0,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
        |      / COUNT(*)
        |  FROM sqv_orders GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT o_orderpriority, m + 1, avg_sales * 0.9
        |  FROM forecast WHERE m < 12
        |)
        |SELECT o_orderpriority, m, round(avg_sales, 6) AS avg_sales
        |FROM forecast ORDER BY o_orderpriority, m""".stripMargin)
    }),

    // SQL-text MERGE INTO (M11, r16) — the dbt incremental-
    // materialization verb, last of the §2.M parser surfaces. Spark 4
    // PARSES the statement for any relation but its analyzer accepts it
    // only against v2 row-level-operation catalog tables (probed:
    // UNSUPPORTED_FEATURE.TABLE_OPERATION on a temp view, pinned in
    // SqlMergeSpec), so the verb runs through MergeIntoViews: Spark's
    // own parser → ANSI-MERGE interpretation over the session catalog →
    // temp-view re-point (sessions built with spark.sql.extensions run
    // the same text straight through spark.sql — ExtensionsSpec).
    // The statement exercises all three clause groups and clause
    // ORDERING (conditional DELETE shadows the unconditional UPDATE):
    // matched+price>300k deleted, remaining matched updated to the
    // source price + 'U', unmatched source inserted only under 100k as
    // 'N', target-only rows under 50k deleted. The oracle is the
    // full-outer-join CASE emulation — MERGE is sugar over exactly that
    // plan, which is also why it scales: one shuffle join on the key,
    // every clause a codegen'd projection. new_price is ONE IEEE add on
    // the parquet double, so both engines carry identical values.
    "sql_merge" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqv_merge_tgt AS
        |SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM sqv_orders WHERE o_orderkey % 4 < 2""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqv_merge_src AS
        |SELECT o_orderkey AS s_key, o_totalprice + 1000.0 AS new_price
        |FROM sqv_orders WHERE o_orderkey % 4 IN (1, 2)""".stripMargin)
      graft.plans.MergeIntoViews.mergeSql(s,
        """MERGE INTO sqv_merge_tgt t
          |USING sqv_merge_src s
          |ON t.o_orderkey = s.s_key
          |WHEN MATCHED AND s.new_price > 300000.0 THEN DELETE
          |WHEN MATCHED THEN
          |  UPDATE SET o_totalprice = s.new_price, o_orderstatus = 'U'
          |WHEN NOT MATCHED AND s.new_price <= 100000.0 THEN
          |  INSERT (o_orderkey, o_totalprice, o_orderstatus)
          |  VALUES (s.s_key, s.new_price, 'N')
          |WHEN NOT MATCHED BY SOURCE AND t.o_totalprice < 50000.0 THEN
          |  DELETE""".stripMargin)
        .orderBy("o_orderkey")
    }),

    // SQL-text UPDATE over a temp view (M12, r18 — the DML quartet's
    // second verb; DmlViews' scaladoc cites the reference's warehouse
    // DML this carries). Assignment values read the PRE-update row
    // (t.o_totalprice on the right-hand side is the old price), the
    // SET key is bare and the value target-qualified — both forms the
    // validator accepts — and the WHERE confines the rewrite to a
    // deterministic key slice. One codegen'd projection over the scan:
    // no join, no shuffle; the oracle is the CASE projection UPDATE
    // desugars to. new price is ONE IEEE add on the parquet double.
    "sql_update" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqv_upd_t AS
        |SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM sqv_orders""".stripMargin)
      graft.plans.DmlViews.sql(s,
        """UPDATE sqv_upd_t t
          |SET o_totalprice = t.o_totalprice + 1000.0, o_orderstatus = 'U'
          |WHERE o_orderkey % 3 = 0 AND o_totalprice < 200000.0"""
          .stripMargin)
        .orderBy("o_orderkey")
    }),

    // SQL-text DELETE over a temp view (M12): the predicate is
    // deliberately NULLABLE (keys ≡0 mod 5 carry a NULL price) so the
    // query pins three-valued DELETE semantics — only predicate-TRUE
    // rows drop; NULL-predicate rows SURVIVE, which is where a naive
    // `filter(not(cond))` translation goes wrong. One codegen'd
    // filter, no shuffle; the oracle spells the survivor set with the
    // NULL disjunct explicit.
    "sql_delete" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqv_del_t AS
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS DOUBLE)
        |       ELSE o_totalprice END AS price
        |FROM sqv_orders""".stripMargin)
      graft.plans.DmlViews.sql(s,
        "DELETE FROM sqv_del_t WHERE price > 150000.0")
        .orderBy("o_orderkey")
    }),

    // SQL-text INSERT INTO with an explicit REORDERED column list
    // (M12): listed columns take the query output in list order, the
    // unlisted `src` column NULL-fills — the v2 missing-column
    // contract; the appended keys are disjoint from the base so the
    // result is order-normalizable. INSERT OVERWRITE, BY NAME, bare
    // positional arity, and the catalog-table pass-through are pinned
    // in SqlDmlSpec. Append is a union below the view pointer — no
    // shuffle beyond the query's own plan.
    "sql_insert" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqv_ins_t AS
        |SELECT o_orderkey, o_totalprice, 'B' AS src
        |FROM sqv_orders WHERE o_orderkey % 2 = 0""".stripMargin)
      graft.plans.DmlViews.sql(s,
        """INSERT INTO sqv_ins_t (o_totalprice, o_orderkey)
          |SELECT o_totalprice + 0.5, o_orderkey
          |FROM sqv_orders WHERE o_orderkey % 2 = 1""".stripMargin)
        .orderBy("o_orderkey")
    }),

    // The session-extension function surface: graft_dot (the native
    // codegen'd DotProductExpr) invoked FROM SQL TEXT through the
    // function registry — what a spark.sql.extensions deployment gives
    // a SQL user. Same ascending-index double fold as the Column path
    // and the oracle's dDot, so the result is bit-identical; LIMIT 1
    // makes the 1-row probe cross-join bound structural.
    "sql_graft_dot" -> ((s, d) => {
      GraftExtensions.register(s)
      embeddings(s, d).createOrReplaceTempView("sqv_embeddings")
      s.sql("""SELECT e.vec_id,
        |  round(graft_dot(e.embedding, p.p), 6) AS dotp
        |FROM sqv_embeddings e,
        |  (SELECT embedding AS p FROM sqv_embeddings
        |   WHERE vec_id = 0 LIMIT 1) p
        |ORDER BY e.vec_id""".stripMargin)
    }),

    // The dbt model-graph runner (K5/K7, r17) — the reference's `dbt
    // run` in-process: THREE SQL-text models wired by {{ ref() }},
    // DECLARED OUT OF DEPENDENCY ORDER so the result is wrong unless
    // ModelGraph's topological sort runs them daily → monthly → top.
    // View materialization inlines the whole chain into one plan
    // (Catalyst prunes/pushes across model boundaries — the dbt
    // `ephemeral`-like payoff of lazy views), so the physical shape is
    // the same two-level reaggregation a hand-written query gets: one
    // map-side-combined shuffle per level, decimal sums exact, the
    // IEEE cast only at display. The oracle is the same chain as plain
    // CTEs — materialization must not change results. ModelGraphSpec
    // pins ordering/cycle/unknown-ref mechanics; PipelineSpec replays
    // the reference's own two models through the runner.
    "model_graph" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      import graft.pipeline.ModelGraph
      import graft.pipeline.ModelGraph.Model
      ModelGraph.run(s, Seq(
        Model("mg_top",
          "SELECT mon, days, rev FROM {{ ref('mg_monthly') }} ORDER BY mon"),
        Model("mg_monthly",
          """SELECT substr(d8, 1, 7) AS mon, COUNT(*) AS days,
            |  CAST(round(SUM(drev), 2) AS DOUBLE) AS rev
            |FROM {{ ref('mg_daily') }} GROUP BY substr(d8, 1, 7)"""
            .stripMargin),
        Model("mg_daily",
          """SELECT date_format(o_orderdate, 'yyyy-MM-dd') AS d8,
            |  SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS drev
            |FROM sqv_orders GROUP BY date_format(o_orderdate, 'yyyy-MM-dd')"""
            .stripMargin)))("mg_top")
    }),

    // dbt's INCREMENTAL materialization through the runner (r17) — the
    // verb M11 was built for, end-to-end: batch 1 materializes a
    // partial year-revenue state (even orderkeys, years ≤ 1996 — the
    // "history as first loaded"), batch 2 recomputes years ≥ 1996 over
    // ALL rows and MERGEs it in on uniqueKey=yr. The final state
    // exercises every upsert path deterministically: 1996 is UPDATED
    // (matched), years > 1996 INSERT (not matched), years < 1996
    // SURVIVE untouched (not matched by source). The MERGE source is
    // the model SELECT as a SUBQUERY (`USING (…) s`), so this also pins
    // the r17 subquery-source path at board scale. The oracle replays
    // both batches as CTEs — the merge is sugar over exactly that
    // partition-by-recency union. State is RESET up front (r18: the
    // durable parquet commit store, dbt's --full-refresh) so every
    // invocation (Verify, repeated Bench runs) replays the same
    // two-batch history. Scale: each batch is one map-side-combined
    // aggregate; the merge is the M11 join shape (equi fast-path
    // guard) on a |years|-sized state.
    "model_graph_incremental" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      import graft.pipeline.ModelGraph
      import graft.pipeline.ModelGraph.Model
      ModelGraph.reset(s, "mgi_rev")
      val agg =
        """SELECT date_format(o_orderdate, 'yyyy') AS yr, COUNT(*) AS n,
          |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
          |    AS DOUBLE) AS rev
          |FROM sqv_orders WHERE %s
          |GROUP BY date_format(o_orderdate, 'yyyy')""".stripMargin
      val model = Model("mgi_rev", agg.format(
        "o_orderkey % 2 = 0 AND date_format(o_orderdate, 'yyyy') <= '1996'"),
        materialized = "incremental", uniqueKey = Seq("yr"))
      ModelGraph.run(s, Seq(model))
      ModelGraph.run(s, Seq(model.copy(sql =
        agg.format("date_format(o_orderdate, 'yyyy') >= '1996'"))))
      s.table("mgi_rev").orderBy("yr")
    }),

    // dbt's DELETE+INSERT incremental strategy (r18 — its DEFAULT on
    // Redshift, the reference's warehouse): the same two-batch history
    // as model_graph_incremental, advanced by the two M12 DML
    // statements dbt compiles — `DELETE FROM state WHERE key IN
    // (SELECT key FROM batch)` then `INSERT INTO state BY NAME
    // SELECT * FROM batch` — instead of one MERGE. On clean batches
    // the strategies CONVERGE (same oracle as model_graph_incremental,
    // and ModelGraphSpec pins frame-level agreement); on dup-key
    // batches they faithfully diverge (delete+insert appends both
    // rows like dbt, merge raises the cardinality violation —
    // spec-pinned). The DELETE's IN-subquery runs through the M12
    // interpreter's expression path at board scale. State resets up
    // front so every invocation replays the same history.
    "model_graph_delete_insert" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      import graft.pipeline.ModelGraph
      import graft.pipeline.ModelGraph.Model
      ModelGraph.reset(s, "mgd_rev")
      val agg =
        """SELECT date_format(o_orderdate, 'yyyy') AS yr, COUNT(*) AS n,
          |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
          |    AS DOUBLE) AS rev
          |FROM sqv_orders WHERE %s
          |GROUP BY date_format(o_orderdate, 'yyyy')""".stripMargin
      val model = Model("mgd_rev", agg.format(
        "o_orderkey % 2 = 0 AND date_format(o_orderdate, 'yyyy') <= '1996'"),
        materialized = "incremental", uniqueKey = Seq("yr"),
        incrementalStrategy = "delete+insert")
      ModelGraph.run(s, Seq(model))
      ModelGraph.run(s, Seq(model.copy(sql =
        agg.format("date_format(o_orderdate, 'yyyy') >= '1996'"))))
      s.table("mgd_rev").orderBy("yr")
    }),

    // dbt's SNAPSHOT verb through the runner (r18, the last dbt
    // materialization): a status→label dimension snapshotted twice
    // with explicit batch stamps (dbt stamps the run's wall clock; the
    // board passes lit(1)/lit(2) so the history is exact). Between the
    // batches label 'F' is RESTATED (close + reopen), 'O' arrives
    // unchanged (check strategy skips it), 'P' is absent from batch 2
    // (survives current — dbt's default), and 'X' is new (opens its
    // first version) — every SCD2 transition on a keys-sized
    // dimension. The oracle is the window-over-history reconstruction
    // (dedupe on IS DISTINCT FROM lag, lead for valid_to) — the
    // incremental operator must agree with the whole-history replay
    // batch by batch. State resets up front (--full-refresh) so every
    // invocation replays the same two batches. Scale: the snapshot
    // joins only the CURRENT slice to the batch (see Scd2's scaladoc);
    // scd2_apply carries the row-count version of this claim.
    "model_graph_snapshot" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      import graft.pipeline.ModelGraph
      import graft.pipeline.ModelGraph.Model
      import org.apache.spark.sql.functions.lit
      ModelGraph.reset(s, "mgs_dim")
      val b1 =
        """SELECT DISTINCT o_orderstatus AS st,
          |  CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END
          |    AS label
          |FROM sqv_orders""".stripMargin
      val b2 =
        """SELECT DISTINCT o_orderstatus AS st,
          |  CASE WHEN o_orderstatus = 'O' THEN 'open'
          |       WHEN o_orderstatus = 'F' THEN 'final'
          |       ELSE 'closed' END AS label
          |FROM sqv_orders WHERE o_orderstatus <> 'P'
          |UNION ALL SELECT 'X', 'new'""".stripMargin
      val model = Model("mgs_dim", b1, materialized = "snapshot",
        uniqueKey = Seq("st"))
      ModelGraph.run(s, Seq(model), snapshotAt = lit(1))
      ModelGraph.run(s, Seq(model.copy(sql = b2)), snapshotAt = lit(2))
      s.table("mgs_dim").orderBy("st", "valid_from")
    }),

    // dbt's schema-test battery over the model graph (r18): unique /
    // not_null / accepted_values / relationships run AFTER
    // materialization, one aggregate each, reported with dbt's
    // failure-count semantics. The battery deliberately includes
    // guaranteed-failing rows (o_custkey repeats across orders;
    // status 'P' sits outside the accepted list wherever the scale
    // ships it) so the report proves violations are COUNTED, not just
    // asserted zero — and the oracle recomputes every count from the
    // same model SQL as scalar subqueries. Scale: each test is one
    // map-side-combinable aggregate / one anti join over the
    // materialized relation — the dq_rule_check / dq_referential
    // machinery a 100 TB table already pays for.
    "model_tests" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("sqv_orders")
      customer(s, d).createOrReplaceTempView("sqv_customer")
      import graft.pipeline.ModelGraph
      import graft.pipeline.ModelGraph._
      val models = Seq(
        Model("mt_cust", "SELECT c_custkey FROM sqv_customer"),
        Model("mt_orders",
          "SELECT o_orderkey, o_custkey, o_orderstatus FROM sqv_orders",
          tests = Seq(
            Unique("o_orderkey"), Unique("o_custkey"),
            NotNull("o_custkey"),
            AcceptedValues("o_orderstatus", Seq("O", "F")),
            Relationships("o_custkey", "mt_cust", "c_custkey"))))
      ModelGraph.run(s, models)
      ModelGraph.test(s, models).orderBy("model", "test", "col_name")
    })
  )

  val oracles: Map[String, String] = Map(
    // The hint-free text on the base tables: hints affect only the
    // physical plan, so the hinted Spark run must match this exactly.
    "sql_join_hints" ->
      """SELECT n_name, sum_price, n_orders FROM (
        |  SELECT n_name,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS sum_price,
        |    COUNT(*) AS n_orders
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n_name)
        |ORDER BY n_name""".stripMargin,
    // CASE-WHEN aggregation — the engine-neutral spelling of PIVOT.
    "sql_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(round(SUM(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(30,8)) END), 2) AS DOUBLE)
        |    AS st_o,
        |  CAST(round(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(30,8)) END), 2) AS DOUBLE)
        |    AS st_f,
        |  CAST(round(SUM(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(30,8)) END), 2) AS DOUBLE)
        |    AS st_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "sql_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS metric,
        |  CAST(c_acctbal AS DOUBLE) AS val FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        |FROM customer
        |ORDER BY c_custkey, metric""".stripMargin,
    "sql_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w_rows, 2)
        |    AS DOUBLE) AS roll3_price,
        |  COUNT(*) OVER w_range AS n_keyrange
        |FROM orders
        |WINDOW
        |  w_rows AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  w_range AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "sql_lateral_view" ->
      s"""SELECT tok, COUNT(*) AS n FROM
        |(SELECT unnest($dToks) AS tok FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_values_inline" ->
      """WITH season(m, season) AS (VALUES
        |    (1,'winter'),(2,'winter'),(3,'spring'),(4,'spring'),
        |    (5,'spring'),(6,'summer'),(7,'summer'),(8,'summer'),
        |    (9,'fall'),(10,'fall'),(11,'fall'),(12,'winter'))
        |SELECT season,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
        |    AS sum_price,
        |  COUNT(*) AS n
        |FROM orders JOIN season ON month(o_orderdate) = m
        |GROUP BY season ORDER BY season""".stripMargin,
    "sql_set_ops" ->
      """WITH i AS (SELECT c_custkey AS k FROM customer
        |       INTERSECT SELECT o_custkey FROM orders),
        |     e AS (SELECT c_custkey AS k FROM customer
        |       EXCEPT SELECT o_custkey FROM orders)
        |SELECT 'intersect' AS op, COUNT(*) AS n,
        |       MIN(k) AS min_k, MAX(k) AS max_k FROM i
        |UNION ALL
        |SELECT 'except', COUNT(*), MIN(k), MAX(k) FROM e
        |ORDER BY op""".stripMargin,
    // MERGE emulated as the full-outer-join CASE it desugars to: the
    // WHERE clause removes DELETEd matched rows, un-INSERTed source
    // rows, and NOT-MATCHED-BY-SOURCE DELETEs; the CASEs apply the
    // UPDATE/INSERT images to whatever survives.
    "sql_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 4 < 2),
        |s AS (
        |  SELECT o_orderkey AS s_key, o_totalprice + 1000.0 AS new_price
        |  FROM orders WHERE o_orderkey % 4 IN (1, 2)),
        |j AS (SELECT * FROM t FULL OUTER JOIN s ON t.o_orderkey = s.s_key)
        |SELECT COALESCE(o_orderkey, s_key) AS o_orderkey,
        |  CASE WHEN o_orderkey IS NOT NULL AND s_key IS NOT NULL
        |         THEN new_price
        |       WHEN o_orderkey IS NULL THEN new_price
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey IS NOT NULL AND s_key IS NOT NULL
        |         THEN 'U'
        |       WHEN o_orderkey IS NULL THEN 'N'
        |       ELSE o_orderstatus END AS o_orderstatus
        |FROM j
        |WHERE NOT (o_orderkey IS NOT NULL AND s_key IS NOT NULL
        |           AND new_price > 300000.0)
        |  AND NOT (o_orderkey IS NULL AND new_price > 100000.0)
        |  AND NOT (s_key IS NULL AND o_totalprice < 50000.0)
        |ORDER BY o_orderkey""".stripMargin,
    // UPDATE desugared to the CASE projection it is — hit rows take
    // the assignment images, others pass through.
    "sql_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 AND o_totalprice < 200000.0
        |       THEN o_totalprice + 1000.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  CASE WHEN o_orderkey % 3 = 0 AND o_totalprice < 200000.0
        |       THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // DELETE survivors: predicate FALSE **or NULL** (keys ≡0 mod 5
    // have NULL price and must survive — the three-valued pin).
    "sql_delete" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS DOUBLE)
        |       ELSE o_totalprice END AS price
        |FROM orders
        |WHERE o_orderkey % 5 = 0 OR o_totalprice <= 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    // INSERT append = base UNION ALL the column-list-aligned query
    // rows, unlisted src column NULL.
    "sql_insert" ->
      """SELECT o_orderkey, o_totalprice, 'B' AS src
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice + 0.5, NULL
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,
    "sql_graft_dot" ->
      s"""WITH p AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(${dDot("embedding", "p")}, 6) AS dotp
        |FROM embeddings, p ORDER BY vec_id""".stripMargin,
    // Same recursion, DuckDB's own WITH RECURSIVE — both engines follow
    // the standard UNION ALL working-table semantics and every level is
    // one IEEE multiply on identical doubles, so the match is exact.
    "sql_recursive_cte" ->
      """WITH RECURSIVE forecast(o_orderpriority, m, avg_sales) AS (
        |  SELECT o_orderpriority, 0,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
        |      / COUNT(*)
        |  FROM orders GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT o_orderpriority, m + 1, avg_sales * 0.9
        |  FROM forecast WHERE m < 12
        |)
        |SELECT o_orderpriority, m, round(avg_sales, 6) AS avg_sales
        |FROM forecast ORDER BY o_orderpriority, m""".stripMargin,
    // The SELECT that sql_ctas materializes — a table build must not
    // change the result it stores (row order normalized by the checker).
    "sql_ctas" ->
      """SELECT o_orderpriority,
        |  MAX(CASE WHEN o_orderstatus = 'O' THEN n END) AS o_n,
        |  MAX(CASE WHEN o_orderstatus = 'O' THEN sales END) AS o_sales,
        |  MAX(CASE WHEN o_orderstatus = 'F' THEN n END) AS f_n,
        |  MAX(CASE WHEN o_orderstatus = 'F' THEN sales END) AS f_sales,
        |  MAX(CASE WHEN o_orderstatus = 'P' THEN n END) AS p_n,
        |  MAX(CASE WHEN o_orderstatus = 'P' THEN sales END) AS p_sales
        |FROM (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS sales
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus)
        |GROUP BY o_orderpriority""".stripMargin,

    // The model chain as plain CTEs — the runner's view materialization
    // must be result-transparent.
    "model_graph" ->
      """WITH mg_daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d8,
        |    SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS drev
        |  FROM orders GROUP BY 1),
        |mg_monthly AS (
        |  SELECT substr(d8, 1, 7) AS mon, COUNT(*) AS days,
        |    CAST(round(SUM(drev), 2) AS DOUBLE) AS rev
        |  FROM mg_daily GROUP BY 1)
        |SELECT mon, days, rev FROM mg_monthly ORDER BY mon""".stripMargin,

    // Both incremental batches as CTEs, unioned by recency: batch 2
    // (years >= 1996, all rows) wins where it matched, batch 1's
    // partial history survives below it.
    "model_graph_incremental" ->
      """WITH f AS (
        |  SELECT strftime(o_orderdate, '%Y') AS yr, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS rev
        |  FROM orders WHERE strftime(o_orderdate, '%Y') >= '1996'
        |  GROUP BY 1),
        |h AS (
        |  SELECT strftime(o_orderdate, '%Y') AS yr, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS rev
        |  FROM orders
        |  WHERE o_orderkey % 2 = 0 AND strftime(o_orderdate, '%Y') <= '1996'
        |  GROUP BY 1)
        |SELECT yr, n, rev FROM f
        |UNION ALL
        |SELECT yr, n, rev FROM h WHERE yr < '1996'
        |ORDER BY yr""".stripMargin,
    // delete+insert over clean batches must land exactly where merge
    // does — the same recency-union reconstruction.
    "model_graph_delete_insert" ->
      """WITH f AS (
        |  SELECT strftime(o_orderdate, '%Y') AS yr, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS rev
        |  FROM orders WHERE strftime(o_orderdate, '%Y') >= '1996'
        |  GROUP BY 1),
        |h AS (
        |  SELECT strftime(o_orderdate, '%Y') AS yr, COUNT(*) AS n,
        |    CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |      AS DOUBLE) AS rev
        |  FROM orders
        |  WHERE o_orderkey % 2 = 0 AND strftime(o_orderdate, '%Y') <= '1996'
        |  GROUP BY 1)
        |SELECT yr, n, rev FROM f
        |UNION ALL
        |SELECT yr, n, rev FROM h WHERE yr < '1996'
        |ORDER BY yr""".stripMargin,

    // the window-over-history SCD2 reconstruction: union the batches
    // with their stamps, keep rows whose tracked value IS DISTINCT
    // FROM the key's previous appearance (first load or change), then
    // lead() for valid_to — must equal the incremental batch-by-batch
    // engine state exactly.
    "model_graph_snapshot" ->
      """WITH u AS (
        |  SELECT DISTINCT o_orderstatus AS st,
        |    CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END
        |      AS label, 1 AS ts
        |  FROM orders
        |  UNION ALL
        |  SELECT DISTINCT o_orderstatus,
        |    CASE WHEN o_orderstatus = 'O' THEN 'open'
        |         WHEN o_orderstatus = 'F' THEN 'final'
        |         ELSE 'closed' END, 2
        |  FROM orders WHERE o_orderstatus <> 'P'
        |  UNION ALL SELECT 'X', 'new', 2),
        |v AS (
        |  SELECT st, label, ts,
        |    lag(label) OVER (PARTITION BY st ORDER BY ts) AS prev
        |  FROM u),
        |chg AS (
        |  SELECT st, label, ts FROM v
        |  WHERE prev IS NULL OR label IS DISTINCT FROM prev)
        |SELECT st, label, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY st ORDER BY ts) AS valid_to,
        |  lead(ts) OVER (PARTITION BY st ORDER BY ts) IS NULL
        |    AS is_current
        |FROM chg
        |ORDER BY st, valid_from""".stripMargin,

    // each dbt test's failure count recomputed as a scalar subquery
    // over the same model SQL
    "model_tests" ->
      """WITH mt_orders AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
        |mt_cust AS (SELECT c_custkey FROM customer),
        |r AS (
        |  SELECT 'mt_orders' AS model, 'accepted_values' AS test,
        |    'o_orderstatus' AS col_name,
        |    (SELECT count(*) FROM (
        |       SELECT o_orderstatus FROM mt_orders
        |       WHERE o_orderstatus IS NOT NULL
        |         AND o_orderstatus NOT IN ('O', 'F')
        |       GROUP BY 1)) AS violations
        |  UNION ALL
        |  SELECT 'mt_orders', 'not_null', 'o_custkey',
        |    (SELECT count(*) FROM mt_orders WHERE o_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'mt_orders', 'relationships', 'o_custkey',
        |    (SELECT count(*) FROM mt_orders o
        |     WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
        |       SELECT 1 FROM mt_cust c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'mt_orders', 'unique', 'o_custkey',
        |    (SELECT count(*) FROM (
        |       SELECT o_custkey FROM mt_orders WHERE o_custkey IS NOT NULL
        |       GROUP BY 1 HAVING count(*) > 1))
        |  UNION ALL
        |  SELECT 'mt_orders', 'unique', 'o_orderkey',
        |    (SELECT count(*) FROM (
        |       SELECT o_orderkey FROM mt_orders WHERE o_orderkey IS NOT NULL
        |       GROUP BY 1 HAVING count(*) > 1)))
        |SELECT model, test, col_name, violations,
        |  violations = 0 AS passed
        |FROM r ORDER BY model, test, col_name""".stripMargin
  )
}
