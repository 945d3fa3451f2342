package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * `queries` is the full operator inventory of SURVEY.md §2, each entry a
  * named `(SparkSession, sfDir) => DataFrame`; `oracleSql` pairs each
  * SQL-expressible query with ANSI SQL the driver runs in DuckDB over the
  * same parquet tables. Queries without an oracle entry (hash-based sketches,
  * approx aggregates) get the driver's weaker rows-only check and are covered
  * by ScalaTest instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.report(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.Scalars.queries ++
      ops.Joins.queries ++
      ops.Windows.queries ++
      ops.TextSim.queries ++
      ops.Graph.queries ++
      ops.Corpus.queries ++
      ops.Curation.queries ++
      ops.Embeddings.queries ++
      ops.Streaming.queries ++
      ops.Media.queries ++
      ops.SqlSurface.queries ++
      ops.Scd2.queries

  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++
      ops.Scalars.oracles ++
      ops.Joins.oracles ++
      ops.Windows.oracles ++
      ops.TextSim.oracles ++
      ops.Graph.oracles ++
      ops.Corpus.oracles ++
      ops.Curation.oracles ++
      ops.Embeddings.oracles ++
      ops.Streaming.oracles ++
      ops.Media.oracles ++
      ops.SqlSurface.oracles ++
      ops.Scd2.oracles
}
