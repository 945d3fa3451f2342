package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-shaped model-graph runner (K5/K7 completion, r17).
  *
  * The reference's transform layer IS dbt: SQL models that name each
  * other, materialized in dependency order by an external `dbt run`
  * shell-out (`dags/dbt_dags.py:48-78`; `dbt_project.yml:32-36` sets
  * `+materialized: table`, so every model compiles to a DROP + CTAS).
  * The engine had every piece — CTAS (M8), the SQL-text surface (§2.M),
  * programmatic model bodies (Consolidate) — but no declared "run a
  * model set". This is that runner: each model is a name + SQL text in
  * which `{{ ref('other') }}` marks a dependency on another model of
  * the set (dbt's only graph edge); [[ModelGraph.run]] topologically
  * orders the set (Kahn's algorithm, stable w.r.t. declaration order,
  * cycles rejected with the offending path named), substitutes each
  * ref with the referenced model's materialized relation name, and
  * materializes each model under its own name — `view`
  * (CREATE OR REPLACE TEMPORARY VIEW) or `table` (DROP IF EXISTS +
  * CTAS, exactly dbt's table materialization).
  *
  * Relations that are NOT models — the reference's
  * `FROM raw_data."{date}_box_office"` daily tables — stay bare names
  * resolved by the session catalog, dbt's `source()` convention; a
  * `ref()` naming no model in the set is an error (same as dbt's
  * compile-time "model not found"), because a typo'd ref silently
  * falling through to the catalog would read stale relations.
  *
  * Scale posture: the runner adds NOTHING to the physical plans — each
  * model's SQL plans exactly as it would standalone, `view` models
  * inline into their consumers (Catalyst sees the whole chain and
  * prunes/pushes across model boundaries), `table` models are the
  * explicit materialization barrier dbt tables are (scan→…→parquet
  * write, the M8 shape). Ordering and cycle detection are
  * |models|-sized driver work on names only.
  *
  * Cited reference behavior: dbt_dags.py:48-78 (ordered `dbt run` per
  * model), box_office_data.sql / box_office_showrange.sql (the two
  * models ModelGraphSpec reproduces through this runner against
  * Consolidate's DataFrame implementations).
  */
object ModelGraph {

  /** One dbt-style model: SQL text with `{{ ref('name') }}` edges,
    * materialized as a temp `view` (default) or a catalog `table`. */
  final case class Model(name: String, sql: String,
      materialized: String = "view")

  private val Ref =
    """\{\{\s*ref\(\s*['"]([A-Za-z0-9_]+)['"]\s*\)\s*\}\}""".r

  /** Model names referenced by `{{ ref('…') }}` in a model body. */
  def refs(sql: String): Seq[String] =
    Ref.findAllMatchIn(sql).map(_.group(1)).toList.distinct

  /** Substitute each ref marker with its model's relation name (models
    * materialize under their own names, so this is the identity on the
    * captured name — kept separate so a prefixing scheme has one seam). */
  def render(m: Model): String =
    Ref.replaceAllIn(m.sql, mm => mm.group(1))

  /** Dependency-order the set: Kahn's algorithm, stable w.r.t.
    * declaration order among ready models. Unknown refs and cycles
    * throw with the offenders named. */
  def topoOrder(models: Seq[Model]): Seq[Model] = {
    val names = models.map(_.name)
    val dupNames = names.diff(names.distinct).distinct
    require(dupNames.isEmpty,
      s"duplicate model name(s): ${dupNames.mkString(", ")}")
    val deps: Map[String, Seq[String]] =
      models.map(m => m.name -> refs(m.sql)).toMap
    models.foreach { m =>
      val unknown = deps(m.name).filterNot(deps.contains)
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"model ${m.name} references unknown model(s) " +
          s"${unknown.mkString(", ")} — ref() must name a model in the " +
          "set; non-model relations are read by bare name (source())")
    }
    val ordered = Seq.newBuilder[Model]
    var done = Set.empty[String]
    var remaining = models
    while (remaining.nonEmpty) {
      val (ready, blocked) =
        remaining.partition(m => deps(m.name).forall(done))
      if (ready.isEmpty) {
        // every blocked model sits on or feeds a cycle; walk one out
        val blockedNames = blocked.map(_.name).toSet
        val path = Seq.newBuilder[String]
        var seen = Set.empty[String]
        var cur = blocked.head.name
        while (!seen(cur)) {
          path += cur; seen += cur
          cur = deps(cur).find(blockedNames).get
        }
        throw new IllegalArgumentException(
          s"model graph has a cycle: ${(path.result() :+ cur).mkString(" -> ")}")
      }
      ordered ++= ready
      done ++= ready.map(_.name)
      remaining = blocked
    }
    ordered.result()
  }

  /** Materialize every model in dependency order; returns each model's
    * relation read back from the session catalog. Single-writer per
    * session, like dbt's one-process run. */
  def run(spark: SparkSession, models: Seq[Model])
      : Map[String, DataFrame] = {
    topoOrder(models).map { m =>
      val body = render(m)
      m.materialized match {
        case "view" =>
          spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ${m.name} AS $body")
        case "table" => // dbt's table materialization: drop + CTAS
          spark.sql(s"DROP TABLE IF EXISTS ${m.name}")
          spark.sql(s"CREATE TABLE ${m.name} USING PARQUET AS $body")
        case other => throw new IllegalArgumentException(
          s"model ${m.name}: unsupported materialization '$other' " +
            "(view | table)")
      }
      m.name -> spark.table(m.name)
    }.toMap
  }
}
