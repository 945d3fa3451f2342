package graft

import graft.pipeline.ModelGraph
import graft.pipeline.ModelGraph.{AcceptedValues, Model, NotNull,
  Relationships, Unique}
import org.apache.spark.sql.functions.lit

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
    ModelGraph.reset(spark, "mgi_state")
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
    ModelGraph.reset(spark, "mgi_state")
  }

  test("delete+insert incremental strategy (r18, dbt's Redshift " +
      "default): clean batches converge with merge; dup-key batches " +
      "faithfully diverge (both rows insert, no cardinality error); " +
      "unknown strategies refused up front") {
    ModelGraph.reset(spark, "mgd_state")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("k", "v").createOrReplaceTempView("mgd_src")
    val inc = Model("mgd_state", "SELECT k, v FROM mgd_src",
      materialized = "incremental", uniqueKey = Seq("k"),
      incrementalStrategy = "delete+insert")
    ModelGraph.run(spark, Seq(inc))
    // same second batch as the merge test: k=2 revised, k=4 new
    Seq((2L, 99.0), (4L, 40.0))
      .toDF("k", "v").createOrReplaceTempView("mgd_src")
    val out = ModelGraph.run(spark, Seq(inc))("mgd_state")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)),
      "delete+insert must land where merge lands on a clean batch")
    // dup-key batch: dbt's delete+insert appends BOTH rows (the dup-key
    // model this strategy ships) — no cardinality error
    Seq((2L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("mgd_src")
    val dup = ModelGraph.run(spark, Seq(inc))("mgd_state")
      .orderBy("k", "v").as[(Long, Double)].collect().toSeq
    assert(dup === Seq((1L, 10.0), (2L, 1.0), (2L, 2.0), (3L, 30.0),
      (4L, 40.0)))
    val e = intercept[IllegalArgumentException] {
      ModelGraph.run(spark, Seq(inc.copy(incrementalStrategy = "nope")))
    }
    assert(e.getMessage.contains("incrementalStrategy"))
    ModelGraph.reset(spark, "mgd_state")
  }

  test("incremental state is DURABLE (r18): a fresh session — no temp " +
      "views at all — resumes the upsert history from the parquet " +
      "commit store, like dbt's warehouse table") {
    val name = "mgi_dur_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    ModelGraph.reset(spark, name)
    try {
      Seq((1L, 1.0), (2L, 2.0))
        .toDF("k", "v").createOrReplaceTempView("mgi_dur_src")
      val inc = Model(name, "SELECT k, v FROM mgi_dur_src",
        materialized = "incremental", uniqueKey = Seq("k"))
      ModelGraph.run(spark, Seq(inc))
      // a FRESH session: no temp views survive, only the durable store
      val s2 = spark.newSession()
      assert(!s2.sessionState.catalog.isTempView(Seq(name)))
      s2.createDataFrame(Seq((2L, 20.0), (3L, 3.0)))
        .toDF("k", "v").createOrReplaceTempView("mgi_dur_src")
      // the fresh session RESUMES (upsert, not full refresh): k=1
      // survives from session 1's commit, k=2 updates, k=3 inserts —
      // and first-run detection keyed on the STORE, not temp views
      // (r17 ADVICE: an unrelated same-name view can't be adopted)
      val out = ModelGraph.run(s2, Seq(inc))(name)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
        .toSeq
      assert(out === Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
    } finally ModelGraph.reset(spark, name)
  }

  test("resume schema validation: a drifted model SELECT is refused " +
      "with both schemas named (reset() is the full-refresh way out)") {
    val name = "mgi_drift_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    ModelGraph.reset(spark, name)
    try {
      Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("mgi_dr_src")
      val inc = Model(name, "SELECT k, v FROM mgi_dr_src",
        materialized = "incremental", uniqueKey = Seq("k"))
      ModelGraph.run(spark, Seq(inc))
      val drifted = inc.copy(
        sql = "SELECT k, CAST(v AS STRING) AS v FROM mgi_dr_src")
      val e = intercept[IllegalArgumentException] {
        ModelGraph.run(spark, Seq(drifted))
      }
      assert(e.getMessage.contains("does not match the model SELECT"))
      ModelGraph.reset(spark, name)
      ModelGraph.run(spark, Seq(drifted)) // full refresh accepts it
      assert(spark.table(name).schema("v").dataType ===
        org.apache.spark.sql.types.StringType)
    } finally ModelGraph.reset(spark, name)
  }

  test("snapshot materialization: two-batch SCD2 replay — change " +
      "closes + reopens, unchanged skips, absent survives, new key " +
      "opens (dbt's snapshot verb, check strategy)") {
    val name = "mgs_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    ModelGraph.reset(spark, name)
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "c"))
        .toDF("k", "attr").createOrReplaceTempView("mgs_src")
      val snap = Model(name, "SELECT k, attr FROM mgs_src",
        materialized = "snapshot", uniqueKey = Seq("k"))
      ModelGraph.run(spark, Seq(snap), snapshotAt = lit(10))
      // batch 2: k=1 changed, k=2 unchanged, k=3 absent, k=4 new
      Seq((1L, "a2"), (2L, "b"), (4L, "d"))
        .toDF("k", "attr").createOrReplaceTempView("mgs_src")
      val out = ModelGraph.run(spark, Seq(snap), snapshotAt = lit(20))(name)
        .orderBy("k", "valid_from")
        .as[(Long, String, Int, Option[Int], Boolean)].collect().toSeq
      assert(out === Seq(
        (1L, "a", 10, Some(20), false), (1L, "a2", 20, None, true),
        (2L, "b", 10, None, true),
        (3L, "c", 10, None, true),
        (4L, "d", 20, None, true)))
      // and the state is durable: a fresh session reads the history
      assert(spark.newSession().read.parquet(
        spark.table(name).inputFiles.head.replaceAll("/[^/]*$", ""))
        .count() === 5)
    } finally ModelGraph.reset(spark, name)
  }

  test("schema tests: dbt's unique / not_null / accepted_values / " +
      "relationships with failure-count semantics; an unknown " +
      "relationships target is refused") {
    Seq((1L, Some("x")), (2L, Some("x")), (3L, None), (4L, Some("zz")))
      .toDF("id", "ref").createOrReplaceTempView("mtst_src")
    val models = Seq(
      Model("mtst_dim", "SELECT 'x' AS code UNION ALL SELECT 'y'"),
      Model("mtst_fact", "SELECT id, ref FROM mtst_src",
        tests = Seq(
          Unique("id"), Unique("ref"), NotNull("ref"),
          AcceptedValues("ref", Seq("x", "zz")),
          Relationships("ref", "mtst_dim", "code"))))
    ModelGraph.run(spark, models)
    val rep = ModelGraph.test(spark, models)
      .orderBy("test", "col_name")
      .as[(String, String, String, Long, Boolean)].collect().toSeq
    assert(rep === Seq(
      // 'zz' outside nothing — accepted list covers x and zz -> pass
      ("mtst_fact", "accepted_values", "ref", 0L, true),
      ("mtst_fact", "not_null", "ref", 1L, false), // one NULL
      // 'zz' not in mtst_dim -> 1 violating ROW (nulls exempt)
      ("mtst_fact", "relationships", "ref", 1L, false),
      ("mtst_fact", "unique", "id", 0L, true),
      // 'x' appears twice -> 1 duplicated VALUE (not 2 rows)
      ("mtst_fact", "unique", "ref", 1L, false)))
    val e = intercept[IllegalArgumentException] {
      ModelGraph.test(spark, Seq(Model("m", "SELECT 1 AS k",
        tests = Seq(Relationships("k", "nope", "k")))))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("ephemeral materialization (dbt's fifth): the model is NEVER " +
      "materialized — its body compiles into each consumer as a CTE, " +
      "chains nest, a consumer's own WITH clause is spliced, and " +
      "WITH RECURSIVE consumers are refused") {
    Seq((1L, 2.0), (2L, 4.0), (3L, 6.0))
      .toDF("k", "v").createOrReplaceTempView("mge_raw")
    val out = ModelGraph.run(spark, Seq(
      Model("mge_base", "SELECT k, v FROM mge_raw WHERE k < 3",
        materialized = "ephemeral"),
      // ephemeral-on-ephemeral: the recorded body is self-contained
      Model("mge_mid", "SELECT k, v * 10 AS w FROM {{ ref('mge_base') }}",
        materialized = "ephemeral"),
      // consumer with its OWN WITH clause — the prelude is spliced in
      Model("mge_final",
        """WITH big AS (SELECT * FROM {{ ref('mge_mid') }} WHERE w > 25)
          |SELECT SUM(w) AS total FROM big""".stripMargin)))
    assert(out("mge_final").as[Double].collect().toSeq === Seq(40.0))
    // nothing materialized for the ephemerals: no temp view, no table —
    // but the returned frames ARE their standalone compiled forms
    assert(!spark.sessionState.catalog.isTempView(Seq("mge_base")) &&
      !spark.sessionState.catalog.isTempView(Seq("mge_mid")))
    assert(out("mge_mid").orderBy("k").as[(Long, Double)].collect().toSeq
      === Seq((1L, 20.0), (2L, 40.0)))
    // schema tests run against the compiled inline form, like dbt
    val tested = Seq(
      Model("mge_base2", "SELECT k FROM mge_raw", materialized = "ephemeral",
        tests = Seq(ModelGraph.Unique("k"))))
    ModelGraph.run(spark, tested)
    val rep = ModelGraph.test(spark, tested)
      .as[(String, String, String, Long, Boolean)].collect().toSeq
    assert(rep === Seq(("mge_base2", "unique", "k", 0L, true)))
    // a WITH RECURSIVE consumer cannot take the prelude
    val e = intercept[IllegalArgumentException] {
      ModelGraph.run(spark, Seq(
        Model("mge_e", "SELECT 1 AS n", materialized = "ephemeral"),
        Model("mge_rec",
          """WITH RECURSIVE r AS (SELECT n FROM {{ ref('mge_e') }}
            |UNION ALL SELECT n + 1 FROM r WHERE n < 3)
            |SELECT * FROM r""".stripMargin)))
    }
    assert(e.getMessage.contains("RECURSIVE"))
  }

  test("never-read-stale guards (r18): a table model shadowed by a " +
      "temp view throws; a stateful model shadowing a catalog table " +
      "throws") {
    val tbl = "mg_guard_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    Seq(1).toDF("k").createOrReplaceTempView(tbl)
    val e = intercept[IllegalArgumentException] {
      ModelGraph.run(spark, Seq(
        Model(tbl, "SELECT 1 AS k", materialized = "table")))
    }
    assert(e.getMessage.contains("SHADOW"))
    spark.catalog.dropTempView(tbl)
    spark.sql(s"CREATE TABLE $tbl USING PARQUET AS SELECT 1 AS k")
    try {
      val e2 = intercept[IllegalArgumentException] {
        ModelGraph.run(spark, Seq(Model(tbl, "SELECT 1 AS k",
          materialized = "incremental", uniqueKey = Seq("k"))))
      }
      assert(e2.getMessage.contains("SHADOW"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
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
        ModelGraph.run(spark, Seq(Model("m", "SELECT 1", "materialized_view")))
      }
      assert(e.getMessage.contains("materialized_view"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
