package graft

import graft.plans.DmlViews

/** UPDATE / DELETE / INSERT over temp views (M12) — DmlViews' ANSI
  * semantics on golden micro-data, the pinned Spark refusals that
  * motivate the interpreters, and the validation battery (unknown /
  * duplicate / wrong-qualifier assignment keys, arity mismatches,
  * catalog-guard). The board-scale twins are `sql_update` /
  * `sql_delete` / `sql_insert` with exact DuckDB oracles; the raw
  * `spark.sql` parser path is pinned in ExtensionsSpec.
  */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTarget(): Unit =
    Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, None: Option[Double], "c"))
      .toDF("k", "v", "st").createOrReplaceTempView("dml_t")

  test("Spark 4 itself refuses UPDATE / DELETE / INSERT on a temp view " +
      "(pins WHY the interpreters exist; a release lifting this shows " +
      "up here)") {
    freshTarget()
    val up = intercept[Exception] {
      spark.sql("UPDATE dml_t SET v = 1.0 WHERE k = 1")
    }
    assert(up.getMessage.contains("UPDATE") ||
      up.getMessage.contains("UNSUPPORTED"),
      s"expected the UPDATE refusal, got: ${up.getMessage.take(300)}")
    val del = intercept[Exception] {
      spark.sql("DELETE FROM dml_t WHERE k = 1")
    }
    // Spark 4.1's native DELETE path dies on a temp view with an
    // INTERNAL_ERROR ("Unexpected table relation: LocalRelation") —
    // still a refusal, just a less graceful one than UPDATE's
    assert(del.getMessage.contains("DELETE") ||
      del.getMessage.contains("UNSUPPORTED") ||
      del.getMessage.contains("INTERNAL_ERROR"),
      s"expected the DELETE refusal, got: ${del.getMessage.take(300)}")
    val ins = intercept[Exception] {
      spark.sql("INSERT INTO dml_t VALUES (9L, 9.0, 'z')")
    }
    assert(ins.getMessage.contains("INSERT") ||
      ins.getMessage.contains("UNSUPPORTED") ||
      ins.getMessage.contains("NOT_SUPPORTED"),
      s"expected the INSERT refusal, got: ${ins.getMessage.take(300)}")
  }

  test("UPDATE: assignments read the PRE-update row (column swap), " +
      "WHERE is three-valued (NULL-predicate rows untouched), view " +
      "re-pointed") {
    freshTarget()
    // swap-ish: v takes 2*v, st takes old v's string — both read OLD v.
    // WHERE v < 15.0 is TRUE only for k=1; k=3's NULL v must not update.
    val out = DmlViews.sql(spark,
      """UPDATE dml_t SET v = v * 2, st = CAST(v AS STRING)
        |WHERE v < 15.0""".stripMargin)
      .orderBy("k").as[(Long, Option[Double], String)].collect().toSeq
    assert(out === Seq((1L, Some(20.0), "10.0"), (2L, Some(20.0), "b"),
      (3L, None, "c")))
    // re-point: a second read through the catalog sees the new state
    assert(spark.table("dml_t").filter($"st" === "10.0").count() === 1)
  }

  test("UPDATE validation: unknown SET column, duplicate assignment, " +
      "and a non-target qualifier all throw the analysis error") {
    freshTarget()
    val unknown = intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "UPDATE dml_t SET nope = 1.0")
    }
    assert(unknown.getMessage.contains("unknown target column"))
    val dup = intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "UPDATE dml_t SET v = 1.0, v = 2.0")
    }
    assert(dup.getMessage.contains("more than once"))
    val qual = intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "UPDATE dml_t t SET s.v = 1.0")
    }
    assert(qual.getMessage.contains("target alias"))
  }

  test("DELETE: predicate-TRUE rows drop, FALSE and NULL survive; " +
      "DELETE without WHERE empties the view") {
    freshTarget()
    val out = DmlViews.sql(spark, "DELETE FROM dml_t WHERE v > 15.0")
      .orderBy("k").as[(Long, Option[Double], String)].collect().toSeq
    // k=2 (20.0 > 15) drops; k=1 FALSE survives; k=3 NULL survives
    assert(out === Seq((1L, Some(10.0), "a"), (3L, None, "c")))
    DmlViews.sql(spark, "DELETE FROM dml_t")
    assert(spark.table("dml_t").count() === 0)
  }

  test("INSERT: bare positional with cast, explicit reordered column " +
      "list with NULL fill, BY NAME with reorder + missing-column NULL, " +
      "and OVERWRITE replacing the contents") {
    freshTarget()
    // bare positional: arity 3, int literal casts to the double column
    DmlViews.sql(spark, "INSERT INTO dml_t SELECT 4L, 4, 'd'")
    // reordered column list: st unlisted -> NULL
    DmlViews.sql(spark, "INSERT INTO dml_t (v, k) SELECT 5.0, 5L")
    // BY NAME: reordered names; st omitted -> NULL
    DmlViews.sql(spark,
      "INSERT INTO dml_t BY NAME SELECT 6.0 AS v, 6L AS k")
    val out = spark.table("dml_t").orderBy("k")
      .as[(Long, Option[Double], Option[String])].collect().toSeq
    assert(out === Seq((1L, Some(10.0), Some("a")),
      (2L, Some(20.0), Some("b")), (3L, None, Some("c")),
      (4L, Some(4.0), Some("d")), (5L, Some(5.0), None),
      (6L, Some(6.0), None)))
    DmlViews.sql(spark, "INSERT OVERWRITE dml_t SELECT 9L, 9.0, 'z'")
    assert(spark.table("dml_t").as[(Long, Option[Double], Option[String])]
      .collect().toSeq === Seq((9L, Some(9.0), Some("z"))))
  }

  test("INSERT validation: positional arity mismatch, column-list arity " +
      "mismatch, unknown listed column, duplicate listed column, " +
      "unknown BY NAME column, and PARTITION specs all throw") {
    freshTarget()
    assert(intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "INSERT INTO dml_t SELECT 1L, 2.0")
    }.getMessage.contains("column(s)"))
    assert(intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "INSERT INTO dml_t (k, v) SELECT 1L")
    }.getMessage.contains("column list has"))
    assert(intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "INSERT INTO dml_t (k, nope) SELECT 1L, 2.0")
    }.getMessage.contains("unknown target column"))
    assert(intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "INSERT INTO dml_t (k, k) SELECT 1L, 2L")
    }.getMessage.contains("more than once"))
    assert(intercept[IllegalArgumentException] {
      DmlViews.sql(spark, "INSERT INTO dml_t BY NAME SELECT 1L AS nope")
    }.getMessage.contains("match no target column"))
    assert(intercept[IllegalArgumentException] {
      DmlViews.sql(spark,
        "INSERT INTO dml_t PARTITION (k = 1) SELECT 2.0, 'a'")
    }.getMessage.contains("PARTITION"))
  }

  test("INSERT from an inline VALUES relation (multi-row, NULL cell) " +
      "and UPDATE with an IN-subquery WHERE — both through the " +
      "interpreters' analyzer path") {
    freshTarget()
    DmlViews.sql(spark,
      "INSERT INTO dml_t VALUES (7L, 7.0, 'g'), (8L, CAST(NULL AS DOUBLE), 'h')")
    Seq(1L, 8L).toDF("sel").createOrReplaceTempView("dml_sel")
    DmlViews.sql(spark,
      "UPDATE dml_t SET st = 'hit' WHERE k IN (SELECT sel FROM dml_sel)")
    val out = spark.table("dml_t").orderBy("k")
      .as[(Long, Option[Double], String)].collect().toSeq
    assert(out === Seq((1L, Some(10.0), "hit"), (2L, Some(20.0), "b"),
      (3L, None, "c"), (7L, Some(7.0), "g"), (8L, None, "hit")))
  }

  test("chained DML over one view: UPDATE then DELETE then INSERT — the " +
      "re-point lineage stays constraint-consistent (regression: a " +
      "re-alias projection under DELETE's checkpoint captured a stale " +
      "pre-checkpoint attribute constraint that crashed the INSERT " +
      "union's rewriteConstraints)") {
    freshTarget()
    DmlViews.sql(spark, "UPDATE dml_t SET v = v + 0.5 WHERE k = 1")
    DmlViews.sql(spark, "DELETE FROM dml_t WHERE k = 2")
    DmlViews.sql(spark, "INSERT INTO dml_t SELECT 9L, 90.0, 'z'")
    val out = spark.table("dml_t").orderBy("k")
      .as[(Long, Option[Double], String)].collect().toSeq
    assert(out === Seq((1L, Some(10.5), "a"), (3L, None, "c"),
      (9L, Some(90.0), "z")))
  }

  test("DML target guard: a catalog table (or unknown relation) is " +
      "refused — the re-point would silently shadow it") {
    freshTarget()
    spark.sql("DROP TABLE IF EXISTS dml_cat_t")
    spark.sql("CREATE TABLE dml_cat_t (k BIGINT, v DOUBLE) USING parquet")
    try {
      val e = intercept[IllegalArgumentException] {
        DmlViews.sql(spark, "UPDATE dml_cat_t SET v = 1.0")
      }
      assert(e.getMessage.contains("temp view"))
      val e2 = intercept[IllegalArgumentException] {
        DmlViews.sql(spark, "DELETE FROM dml_cat_t WHERE k = 1")
      }
      assert(e2.getMessage.contains("temp view"))
      val e3 = intercept[IllegalArgumentException] {
        DmlViews.sql(spark, "INSERT INTO dml_cat_t SELECT 1L, 1.0")
      }
      assert(e3.getMessage.contains("temp view"))
    } finally spark.sql("DROP TABLE IF EXISTS dml_cat_t")
  }
}
