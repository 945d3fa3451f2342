package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProductExpr

/** IVF (inverted-file) ANN index: a coarse k-means quantizer partitions the
  * vector space into cells; a probe searches only its nearest `nprobe`
  * cells. Complements the sign-LSH variant (`sim_topk_lsh`) — IVF adapts
  * to the data distribution where LSH is data-oblivious.
  *
  * The quantizer is fit with a DataFrame-native Lloyd iteration:
  * assignment is a broadcast argmin over the k centroids, the update step
  * is an explode-by-dimension decimal-exact mean (groupBy(cell, pos),
  * exactSum/count — one shuffle of n×dim skinny rows; deterministic
  * regardless of partition order, which makes the whole fit oracle-
  * replayable). Centroids are collected to the driver
  * between iterations: they are MODEL PARAMETERS (k×dim floats, ~4 KB
  * here), not data — the same role as a broadcast dimension table, so the
  * collect is scale-legitimate; the data itself never leaves executors.
  *
  * Scale posture: index build is O(iters × n × k) distance work, map-only
  * per iteration plus one skinny shuffle; search touches nprobe/k of the
  * corpus per probe. Cell ids ride with the stored vectors, so at 100 TB
  * the cell assignment is written once (partitionBy(cell)) and probes
  * prune to their cells' files.
  */
object Ivf {

  /** Rank-equivalent distance score: ||e-c||² minus the ||e||² term,
    * which is constant across the k centroids for a given row and would
    * waste k extra dot products per row in argmin/sort positions. */
  private def rankDist(e: Column, c: Column): Column =
    DotProductExpr.dot(c, c) - lit(2.0) * DotProductExpr.dot(e, c)

  /** Fit k centroids over `vectors(embedding: array<float>)` with `iters`
    * Lloyd iterations, deterministically seeded from the lowest ids.
    */
  def fitCentroids(vectors: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id"): Seq[Seq[Float]] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    var centroids: Seq[Seq[Float]] = vectors
      .orderBy(col(idCol)).limit(k)
      .select(col("embedding")).as[Seq[Float]].collect().toSeq
    for (_ <- 1 to iters) {
      val assigned = assign(vectors, centroids)
      // mean as decimal-exact sum / exact count (NOT avg(): a double avg
      // sums in partition/combine order, so the same data could yield
      // last-ulp-different centroids run to run — and r11 promotes
      // sim_topk_ivf to an exact oracle row, which needs the whole fit
      // replayable bit-for-bit in DuckDB)
      val updated = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((exactSum(col("x").cast("double")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cell")
        .agg(collect_list(struct(col("pos"), col("m"))).as("raw"))
        .select(col("cell"),
          transform(array_sort(col("raw")),
            s => s.getField("m").cast("float")).as("centroid"))
        .as[(Int, Seq[Float])].collect().toMap
      // empty cells keep their previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Attach the nearest-centroid cell id to each vector (the index). */
  def assign(vectors: DataFrame, centroids: Seq[Seq[Float]]): DataFrame = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(rankDist(col("embedding"), typedlit(c)).as("d"), lit(i).as("i"))
    }
    vectors.withColumn("cell", array_min(array(dists: _*)).getField("i"))
  }

  /** All (probe_id, cand_id, cos) candidates the index scores for each
    * probe's `nprobe` nearest cells — `search` minus the final top-k, so
    * the nprobe tuning sweep (`ivf_nprobe_sweep`) can count scored
    * candidates and compute recall from the same rows `search` ranks. */
  def candidates(vectors: DataFrame, centroids: Seq[Seq[Float]],
      probes: DataFrame, nprobe: Int,
      idCol: String = "vec_id"): DataFrame =
    candidatesFromIndex(
      index(vectors, centroids, idCol), centroids, probes, nprobe, idCol)

  /** The E-step projected to the (cand_id, e, cell) layout
    * [[candidatesFromIndex]] consumes — split out (r18 optimization
    * round) so a multi-config sweep can checkpoint ONE cell assignment
    * and probe it per config instead of re-running the full-corpus
    * E-step per use: `ivf_nprobe_sweep` previously ran `assign` six
    * times (candidates + search × 3 nprobe configs) over identical
    * centroids. In the deployed shape this materialized index IS the
    * IVF index on storage (cell ids written beside the vectors), so
    * reusing it per probe batch is the production read path, not a
    * bench shortcut. */
  def index(vectors: DataFrame, centroids: Seq[Seq[Float]],
      idCol: String = "vec_id"): DataFrame =
    assign(vectors, centroids)
      .select(col(idCol).as("cand_id"), col("embedding").as("e"),
        col("cell"))

  /** [[candidates]] over an already-computed (possibly checkpointed)
    * index — same rows by construction (assign is deterministic and
    * `index` is a pure projection of it). */
  def candidatesFromIndex(indexed: DataFrame, centroids: Seq[Seq[Float]],
      probes: DataFrame, nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    val probeCells = {
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        struct(rankDist(col("embedding"), typedlit(c)).as("d"), lit(i).as("i"))
      }
      probes
        .select(col(idCol).as("probe_id"), col("embedding").as("p"),
          slice(array_sort(array(dists: _*)), 1, nprobe).as("cells"))
        .select(col("probe_id"), col("p"),
          explode(col("cells")).as("cstruct"))
        .select(col("probe_id"), col("p"), col("cstruct.i").as("cell"))
    }
    probeCells.join(indexed, Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        (DotProductExpr.dot(col("e"), col("p")) /
          (sqrt(DotProductExpr.dot(col("e"), col("e"))) *
            sqrt(DotProductExpr.dot(col("p"), col("p"))))).as("cos"))
  }

  /** Exact re-rank inside the probes' `nprobe` nearest cells. */
  def search(vectors: DataFrame, centroids: Seq[Seq[Float]],
      probes: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id"): DataFrame =
    rankCandidates(candidates(vectors, centroids, probes, nprobe, idCol), k)

  /** `search`'s final top-k over an already-computed candidate set —
    * split out so the sweep can rank the SAME (checkpointed) candidate
    * rows it counts, instead of re-deriving them through a second
    * E-step. Ordering (cos desc, cand_id) is total per probe, so the
    * top-k is identical however the candidate rows were produced. */
  def rankCandidates(cand: DataFrame, k: Int): DataFrame =
    cand
      .withColumn("rk", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cos").desc, col("cand_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("probe_id", "rk")
}
