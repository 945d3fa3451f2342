package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph operators for dedup clustering. Production LLM dedup does not stop
  * at candidate pairs: MinHash/LSH emits an edge list, and documents are
  * grouped into CONNECTED COMPONENTS of that graph so each transitive
  * cluster keeps exactly one representative (a greedy pairwise drop
  * under-merges: a~b, b~c with a!~c still must collapse to one keeper).
  * The reference has no graph step (its dedup is per-day DISTINCT); this is
  * part of the brief's training-data-pipeline scope.
  *
  * Algorithm: iterative min-label propagation —
  * `label(v) <- min(label(v), min over neighbors label(u))` to fixpoint —
  * the Pregel shape expressed as DataFrame joins. Each iteration is one
  * shuffle join + one aggregation; the driver-side loop holds only a
  * CHANGED COUNT (an aggregate action, not data). Convergence is bounded by
  * component diameter: LSH dup clusters are near-cliques (band collisions
  * connect most members directly), so 2-4 iterations in practice; MaxIter
  * caps pathological chains.
  *
  * Scale notes (100 TB):
  *  - `localCheckpoint` truncates plan lineage each iteration — without it
  *    the plan doubles per round and analysis time blows up long before
  *    data does. On a real cluster use reliable `checkpoint` to also drop
  *    shuffle-replay chains.
  *  - Each iteration shuffles edges on `dst` and labels on `doc_id` —
  *    linear in |E|, and |E| out of LSH banding is near-linear in corpus
  *    size (collision pairs only, est_sim >= 0.5 filtered).
  *  - For graphs with long chains, the O(log n) alternating large-star /
  *    small-star contraction (Kiveris et al., "Connected Components in
  *    MapReduce and Beyond") replaces this loop; dup graphs don't need it.
  */
object Graph {

  private val MaxIter = 20

  /** Connected components of an undirected edge list. `edges` has columns
    * (src, dst); returns (doc_id, comp) where comp is the min vertex id in
    * the component, covering every vertex in `vertices`.
    */
  private[graft] def connectedComponents(
      vertices: DataFrame, edges: DataFrame): DataFrame = {
    // Materialize the edge list ONCE — it is typically the output of a
    // whole candidate-generation pipeline (MinHash+LSH here); without this
    // checkpoint every iteration would recompute that upstream plan.
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var lab = vertices.select(col("doc_id"), col("doc_id").as("comp"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < MaxIter) {
      val nbrMin = sym
        .join(lab.select(col("doc_id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min("comp").as("nc"))
      // One join per iteration: keep old and new labels side by side in
      // the checkpointed result so the convergence count is a scan of it,
      // not a second join against the previous labels.
      val merged = lab.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("comp"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("nxt"))
        .localCheckpoint()
      changed = merged.filter(col("nxt") < col("comp")).count()
      lab = merged.select(col("doc_id"), col("nxt").as("comp"))
      i += 1
    }
    // Silent truncation would return WRONG labels (one true cluster split
    // into several, each with its own kept representative) and diverge
    // from the exact oracle with no signal — fail loudly instead. Dup
    // graphs are near-cliques (2-4 rounds); hitting 20 means the input is
    // not that graph, and the O(log n) star-contraction variant is due.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxIter iterations " +
          s"($changed labels still changing) — graph diameter exceeds " +
          "MaxIter; use star-contraction for long-chain graphs")
    lab
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cluster-level dedup: connected components over the MinHash/LSH
    // candidate-pair graph (TextSim.minhashPairs, est_sim >= 0.5). Every
    // document gets its cluster id (min doc_id in the component), the
    // cluster size, and a kept flag (the representative). Singletons are
    // their own component of size 1.
    "dedup_cc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = TextSim.minhashPairs(docs)
        .select(col("ia").as("src"), col("ib").as("dst"))
      val lab = connectedComponents(docs.select("doc_id"), edges)
      lab
        .withColumn("comp_size",
          count(lit(1)).over(Window.partitionBy("comp")))
        .select(col("doc_id"), col("comp"), col("comp_size"),
          (col("doc_id") === col("comp")).cast("int").as("kept"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // DuckDB mirror: same LSH candidate pairs (dMinhashCte), components via
    // a recursive reachability walk, label = min reachable id.
    "dedup_cc" ->
      s"""WITH RECURSIVE
        |${TextSim.dMinhashCte},
        |edges AS (SELECT ia AS src, ib AS dst FROM pairs
        |  UNION SELECT ib, ia FROM pairs),
        |reach AS (
        |  SELECT doc_id, doc_id AS r FROM documents
        |  UNION
        |  SELECT w.doc_id, e.dst AS r FROM reach w
        |  JOIN edges e ON w.r = e.src),
        |lab AS (SELECT doc_id, min(r) AS comp FROM reach GROUP BY 1)
        |SELECT doc_id, comp,
        |  count(*) OVER (PARTITION BY comp) AS comp_size,
        |  CAST(doc_id = comp AS INT) AS kept
        |FROM lab ORDER BY doc_id""".stripMargin
  )
}
