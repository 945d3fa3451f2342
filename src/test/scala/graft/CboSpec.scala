package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Cost-based-optimizer evidence (r10 verdict item 5): every other
  * Catalyst lever in this repo has pinned evidence (pushdown, pruning,
  * AQE skew split, bucketing); this spec pins CBO join reorder actually
  * FIRING. The TPC-H shapes in ops/Joins.scala rely on hand-ordered
  * joins + AQE — correct and scale-safe — but a 100 TB deployment feeding
  * ad-hoc SQL needs the engine to fix a BADLY-ordered join itself, and
  * that takes table/column statistics (`ANALYZE TABLE`) plus
  * `spark.sql.cbo.enabled` / `spark.sql.cbo.joinReorder.enabled` (both
  * default-off in Spark 4.1).
  *
  * The probe: TPC-H Q5's join graph written in the PESSIMAL syntactic
  * order (facts first — `lineitem, orders, customer, supplier, nation,
  * region`). Rule-based Spark keeps that order (ReorderJoin only rotates
  * to avoid cartesians; every adjacent pair here has a key). With stats,
  * CostBasedJoinReorder rebuilds the tree from selectivity — the measured
  * plan starts from the nation⋈region⋈supplier dimension spine and joins
  * the facts LAST, which is the order a human would write. Pinned
  * before/after plans in PLANS.md ("CBO join reorder").
  *
  * Scale note: stats collection is a metadata scan (`COMPUTE STATISTICS`
  * is O(files) from parquet footers; FOR COLUMNS adds one pass) — at
  * 100 TB you run it per-partition on ingest, not per-query.
  */
class CboSpec extends SparkSpec {

  private val tables =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region")

  private val q5BadOrder = """
    SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM cbo_audit.lineitem l, cbo_audit.orders o, cbo_audit.customer c,
         cbo_audit.supplier s, cbo_audit.nation n, cbo_audit.region r
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name"""

  /** In-order leaf table names of the OPTIMIZED logical plan — the join
    * order the planner actually chose. */
  private def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case h: HiveTableRelation => h.tableMeta.identifier.table
      case l: LogicalRelation =>
        l.catalogTable.map(_.identifier.table).getOrElse("?")
    }

  private def withCbo[A](on: Boolean)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, on.toString))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_audit")
    tables.foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet")
        .write.mode("overwrite").saveAsTable(s"cbo_audit.$t")
      spark.sql(s"ANALYZE TABLE cbo_audit.$t COMPUTE STATISTICS")
    }
  }

  override def afterAll(): Unit = {
    try spark.sql("DROP DATABASE IF EXISTS cbo_audit CASCADE")
    finally super.afterAll()
  }

  test("ANALYZE TABLE stats are visible to the planner (rowCount set)") {
    withCbo(on = true) {
      val stats = spark.table("cbo_audit.lineitem")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong > 0L),
        s"expected a rowCount from ANALYZE, got $stats")
    }
  }

  test("CBO join reorder rebuilds a pessimally-ordered Q5 join from " +
    "statistics; without CBO the syntactic order survives") {
    val withStats = withCbo(on = true) { leafOrder(spark.sql(q5BadOrder)) }
    val without = withCbo(on = false) { leafOrder(spark.sql(q5BadOrder)) }
    assert(without.head == "lineitem",
      s"rule-based plan should keep the written fact-first order: $without")
    assert(withStats != without,
      "CBO produced the identical join order — reorder did not fire")
    // the reordered plan must not START from a fact table: CBO's whole
    // point is building from the small, selective dimension spine
    assert(!Set("lineitem", "orders").contains(withStats.head),
      s"CBO still leads with a fact table: $withStats")
    // and both plans must agree on the answer
    val a = withCbo(on = true) {
      spark.sql(q5BadOrder).collect().map(r => r.getString(0) -> r.get(1)).toMap
    }
    val b = withCbo(on = false) {
      spark.sql(q5BadOrder).collect().map(r => r.getString(0) -> r.get(1)).toMap
    }
    assert(a == b)
  }
}
