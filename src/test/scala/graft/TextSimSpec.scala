package graft

import org.apache.spark.sql.functions._

/** Text/dedup/similarity operator tests, including the approximate paths
  * that have no DuckDB oracle (sim_topk_lsh recall, MinHashUnion UDAF).
  */
class TextSimSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_hash: identical texts collapse to one group, keep min id") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = df.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .sort("keep_id")
      .select("keep_id", "n").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash estimated similarity tracks true Jaccard on near-dup docs") {
    // Planted near-dups in the sf0.001 documents: every pair found by the
    // exact 3-gram Jaccard path must also be found by MinHash LSH (these
    // pairs have J >= 0.8, far above the 4x4-band ~0.47 threshold knee).
    val exact = ops.TextSim.queries("dedup_ngram_jaccard")(spark, sf0001)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    val lsh = ops.TextSim.queries("dedup_minhash")(spark, sf0001)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "expected planted near-dup pairs in testdata")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"MinHash LSH missed high-J pairs: $missed")
  }

  test("sim_topk_lsh achieves >=60% recall@5 vs exact sim_topk") {
    val exact = ops.TextSim.queries("sim_topk")(spark, sf0001)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val ann = ops.TextSim.queries("sim_topk_lsh")(spark, sf0001)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(exact.size === 50) // 10 probes x 5
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall@5 too low: $recall")
  }

  test("sim_topk_ivf achieves >=60% recall@5 vs exact sim_topk") {
    val exact = ops.TextSim.queries("sim_topk")(spark, sf0001)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = ops.TextSim.queries("sim_topk_ivf")(spark, sf0001)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@5 too low: $recall")
  }

  test("IVF quantizer assigns every vector to a valid cell") {
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = ops.Ivf.fitCentroids(emb, k = 8, iters = 2)
    assert(centroids.length === 8)
    assert(centroids.forall(_.length === 64))
    val cells = ops.Ivf.assign(emb, centroids)
      .groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(cells.keys.forall(c => c >= 0 && c < 8))
    assert(cells.values.sum === emb.count())
  }

  test("MinHashUnion UDAF: group signature is the elementwise min") {
    functions.MinHashUnion.register(spark)
    val df = Seq(
      ("g1", Seq.tabulate(16)(i => (i + 10).toLong)),
      ("g1", Seq.tabulate(16)(i => (20 - i).toLong)),
      ("g2", Seq.tabulate(16)(_ => 7L))
    ).toDF("g", "sig")
    val got = df.groupBy("g").agg(expr("minhash_union(sig)").as("u"))
      .sort("g").as[(String, Seq[Long])].collect()
    val expected1 = Seq.tabulate(16)(i => math.min(i + 10, 20 - i).toLong)
    assert(got(0)._2 === expected1)
    assert(got(1)._2 === Seq.fill(16)(7L))
  }

  test("text_fingerprint is order-sensitive (rolling, not bag-of-words)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("fp_docs")
    val toks = split(lower(col("text")), " ")
    val vals = transform(toks, t => (length(t) * 31 + ascii(t)).cast("long"))
    val fps = df.select(aggregate(vals, lit(0L),
        (acc, v) => (acc * 1000003L + v) % 1000000007L).as("fp"))
      .as[Long].collect()
    assert(fps(0) !== fps(1))
  }

  test("cosine similarity: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 2.0f)), (3L, Seq(3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val p = df.filter($"vec_id" === 1).select($"embedding".as("p"))
    val cos = df.crossJoin(p)
      .select($"vec_id",
        (dot($"embedding", $"p") /
          (sqrt(dot($"embedding", $"embedding")) * sqrt(dot($"p", $"p"))))
          .as("cos"))
      .sort("vec_id").as[(Long, Double)].collect().toMap
    assert(math.abs(cos(1L) - 1.0) < 1e-12)
    assert(math.abs(cos(2L)) < 1e-12)
    assert(math.abs(cos(3L) - 1.0) < 1e-12)
  }
}
