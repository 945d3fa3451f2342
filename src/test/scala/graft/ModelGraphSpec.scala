package graft

import graft.pipeline.ModelGraph
import graft.pipeline.ModelGraph.Model

/** The dbt-shaped model-graph runner (K7): ref() edge extraction, stable
  * topological ordering, cycle/unknown-ref rejection, and both
  * materializations. The reference two-model reproduction lives in
  * PipelineSpec (it needs the ingest fixture); this spec pins the
  * runner's mechanics on micro-models.
  */
class ModelGraphSpec extends SparkSpec {
  import spark.implicits._

  test("refs: extracts ref('x') / ref(\"x\") markers, deduplicated, " +
      "and render substitutes the relation name") {
    val sql = """SELECT * FROM {{ ref('a') }} JOIN {{ref("b")}} USING (k)
                |WHERE EXISTS (SELECT 1 FROM {{ ref('a') }})""".stripMargin
    assert(ModelGraph.refs(sql) === Seq("a", "b"))
    val rendered = ModelGraph.render(Model("m", sql))
    assert(rendered.contains("FROM a JOIN b USING (k)"))
    assert(!rendered.contains("ref("))
  }

  test("topoOrder: dependency order regardless of declaration order, " +
      "stable among ready models") {
    val ms = Seq(
      Model("final", "SELECT * FROM {{ ref('mid1') }}, {{ ref('mid2') }}"),
      Model("mid2", "SELECT * FROM {{ ref('base') }}"),
      Model("mid1", "SELECT * FROM {{ ref('base') }}"),
      Model("base", "SELECT 1 AS k"))
    assert(ModelGraph.topoOrder(ms).map(_.name) ===
      Seq("base", "mid2", "mid1", "final"))
  }

  test("a cycle is rejected with the offending path named") {
    val ms = Seq(
      Model("a", "SELECT * FROM {{ ref('b') }}"),
      Model("b", "SELECT * FROM {{ ref('c') }}"),
      Model("c", "SELECT * FROM {{ ref('a') }}"),
      Model("ok", "SELECT 1 AS k"))
    val e = intercept[IllegalArgumentException] {
      ModelGraph.topoOrder(ms)
    }
    assert(e.getMessage.contains("cycle") && e.getMessage.contains("a") &&
      e.getMessage.contains("->"))
  }

  test("an unknown ref is a compile error, never a silent catalog " +
      "fall-through; duplicate model names are rejected") {
    val e = intercept[IllegalArgumentException] {
      ModelGraph.topoOrder(Seq(
        Model("m", "SELECT * FROM {{ ref('nope') }}")))
    }
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      ModelGraph.topoOrder(Seq(Model("m", "SELECT 1"), Model("m", "SELECT 2")))
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("incremental materialization: first run full-refreshes, later " +
      "runs upsert on uniqueKey — matched keys update, new keys insert, " +
      "absent keys survive (dbt's incremental, carried by M11 MERGE)") {
    spark.catalog.dropTempView("mgi_state"): Unit
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("k", "v").createOrReplaceTempView("mgi_src")
    val inc = Model("mgi_state", "SELECT k, v FROM mgi_src",
      materialized = "incremental", uniqueKey = Seq("k"))
    ModelGraph.run(spark, Seq(inc))
    assert(spark.table("mgi_state").count() === 3)
    // the source moves on: k=2 revised, k=1/k=3 gone, k=4 new
    Seq((2L, 99.0), (4L, 40.0))
      .toDF("k", "v").createOrReplaceTempView("mgi_src")
    val out = ModelGraph.run(spark, Seq(inc))("mgi_state")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
    // a batch with duplicate uniqueKey rows is the MERGE data error
    Seq((2L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("mgi_src")
    val e = intercept[Exception] { ModelGraph.run(spark, Seq(inc)) }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("GRAFT_MERGE_CARDINALITY_VIOLATION"))
    // and incremental without a uniqueKey is refused up front
    val e2 = intercept[IllegalArgumentException] {
      ModelGraph.run(spark, Seq(
        Model("m", "SELECT 1 AS k", materialized = "incremental")))
    }
    assert(e2.getMessage.contains("uniqueKey"))
  }

  test("run: a ref chain materializes in order — views inline, tables " +
      "persist through the catalog — and non-model relations resolve " +
      "by bare name (source())") {
    Seq((1L, 2.0), (2L, 4.0), (3L, 6.0))
      .toDF("k", "v").createOrReplaceTempView("mg_raw")
    val tbl = "mg_spec_tbl_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    try {
      val out = ModelGraph.run(spark, Seq(
        // declared out of order, mixed materializations, reads the
        // non-model mg_raw by bare name
        Model("mg_final", s"SELECT SUM(w) AS total FROM {{ ref('$tbl') }}"),
        Model(tbl, "SELECT k, v * 2 AS w FROM {{ ref('mg_mid') }}",
          materialized = "table"),
        Model("mg_mid", "SELECT k, v FROM mg_raw WHERE k < 3")))
      assert(out.keySet === Set("mg_final", tbl, "mg_mid"))
      assert(out("mg_final").as[Double].collect().toSeq === Seq(12.0))
      // the table materialization is a real catalog table
      assert(spark.sessionState.catalog
        .tableExists(org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      // unsupported materialization is rejected
      val e = intercept[IllegalArgumentException] {
        ModelGraph.run(spark, Seq(Model("m", "SELECT 1", "ephemeral")))
      }
      assert(e.getMessage.contains("ephemeral"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
