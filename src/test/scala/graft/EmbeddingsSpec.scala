package graft

import org.apache.spark.sql.DataFrame

/** Behavioral pins for the r11 embedding-side training-data ops. The
  * oracle rows prove cross-engine equality; these tests pin the SEMANTICS
  * on inputs the random sf slices cannot produce — separable clusters for
  * the semi-hard branches, prefix-concentrated vectors for recall = 1 —
  * plus an internal-consistency recomputation of the RRF fusion.
  */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Int, Seq[Double])]): DataFrame =
    rows.map { case (id, lab, v) => (id, lab, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "label", "embedding")

  test("mine_triplets: separated clusters give a positive margin and " +
    "semi_hard = 0") {
    // label 0 hugs e1, label 1 hugs e2 — the hardest negative is still
    // nearly orthogonal to every anchor.
    val df = ops.Embeddings.tripletMine(emb(Seq(
      (0L, 0, Seq(1.0, 0.0, 0.01, 0.0)),
      (1L, 0, Seq(0.99, 0.02, 0.0, 0.01)),
      (2L, 0, Seq(0.98, 0.01, 0.02, 0.0)),
      (3L, 1, Seq(0.0, 1.0, 0.01, 0.0)),
      (4L, 1, Seq(0.02, 0.99, 0.0, 0.0)))), nAnchors = 1, margin = 0.2)
    val r = df.collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("anchor_id") === 0L)
    assert(Set(1L, 2L).contains(row.getAs[Long]("hard_pos_id")))
    assert(Set(3L, 4L).contains(row.getAs[Long]("hard_neg_id")))
    assert(row.getAs[Double]("margin") > 0.9)
    assert(row.getAs[Int]("semi_hard") === 0)
  }

  test("mine_triplets: a near-boundary negative flips semi_hard to 1 " +
    "while the margin stays positive") {
    // id 5 is label 1 but sits close to the label-0 cluster: inside the
    // 0.2 semi-hard band, yet not past the hardest positive.
    val df = ops.Embeddings.tripletMine(emb(Seq(
      (0L, 0, Seq(1.0, 0.0, 0.01, 0.0)),
      (1L, 0, Seq(0.99, 0.02, 0.0, 0.01)),
      (2L, 0, Seq(0.98, 0.01, 0.02, 0.0)),
      (3L, 1, Seq(0.0, 1.0, 0.01, 0.0)),
      (5L, 1, Seq(0.93, 0.35, 0.0, 0.0)))), nAnchors = 1, margin = 0.2)
    val row = df.collect().head
    assert(row.getAs[Long]("hard_neg_id") === 5L)
    val m = row.getAs[Double]("margin")
    assert(m > 0.0 && m < 0.2, s"margin $m should be inside the band")
    assert(row.getAs[Int]("semi_hard") === 1)
  }

  test("embed_matryoshka_eval: recall@5 is 1.0 when all information " +
    "lives in the evaluated prefix") {
    // 64-dim vectors, signal only in dims 1–8 (a deterministic spread so
    // no two cosines tie) — the width-8 ranking IS the full ranking.
    val rows = (0L until 8L).map { i =>
      val v = Array.fill(64)(0.0)
      v(0) = 1.0; v((i % 7 + 1).toInt) = 0.05 + 0.11 * i
      (i, 0, v.toSeq)
    }
    val r = ops.Embeddings.matryoshkaEval(emb(rows), Seq(8), nProbes = 2)
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Int]("width") === 8)
    assert(r.head.getAs[Double]("recall_at5") === 1.0)
  }

  test("sim_mmr: skips the near-duplicate plain top-k would take") {
    // probe (vec 0) at e1; id 1 and its near-dup id 2 sit at ~37° from the
    // probe (rel 0.8 — plain top-3 takes both); id 3 mirrors on the OTHER
    // side (rel 0.75, cos to id 1 only ~0.2); id 4 is orthogonal-ish.
    // MMR: round 1 → id 1; round 2 must prefer diverse id 3 (score
    // ≈ .525 − .3·.203 ≈ .46) over the dup id 2 (≈ .56 − .3·1 ≈ .26).
    val df = ops.Embeddings.mmrSelect(emb(Seq(
      (0L, 0, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, 0, Seq(0.8, 0.6, 0.0, 0.0)),
      (2L, 0, Seq(0.8, 0.6, 0.001, 0.0)),
      (3L, 0, Seq(0.75, -0.661, 0.0, 0.0)),
      (4L, 0, Seq(0.6, 0.0, 0.8, 0.0)),
      (5L, 0, Seq(0.1, 0.0, 0.0, 0.99)))), k = 3, poolN = 10)
    val picks = df.collect().map(r =>
      r.getAs[Int]("pick_round") -> r.getAs[Long]("vec_id"))
    assert(picks.toSeq === Seq(1 -> 1L, 2 -> 3L, 3 -> 4L))
    assert(!picks.map(_._2).contains(2L), "the near-dup must be skipped")
  }

  test("embed_quantize_eval: int8 search recovers most of the exact " +
    "top-5 at sf0.001") {
    val r = ops.Embeddings.queries("embed_quantize_eval")(spark, sf0001)
      .collect().head
    val recall = r.getAs[Double]("recall_at5")
    assert(r.getAs[Long]("n_truth") === 50L)
    assert(recall >= 0.8 && recall <= 1.0,
      s"int8 recall@5 $recall outside the pinned band")
  }

  test("ivf_maintenance: cell accounting closes over the corpus and " +
    "growth/rebuild recompute from the counts") {
    val rows = ops.Embeddings.queries("ivf_maintenance")(spark, sf0001)
      .collect()
    val nVec = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_total")).sum === nVec)
    rows.foreach { r =>
      val o = r.getAs[Long]("n_old"); val n = r.getAs[Long]("n_new")
      assert(r.getAs[Long]("n_total") === o + n)
      val wantG = if (o > 0) BigDecimal(n.toDouble / o)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      assert(r.getAs[Double]("growth") === wantG)
      assert(r.getAs[Int]("rebuild") === (if (n.toDouble > 0.25 * o) 1
        else 0))
    }
    // the %7 slice is ~1/7 of every cell — some cell must trip the 25%
    // trigger on this corpus, or the flag is vacuous
    assert(rows.exists(_.getAs[Int]("rebuild") === 1))
  }

  test("sim_rank_metrics: metrics are bounded, int8 dominates every " +
    "lossy prefix, and the int8 recall agrees with embed_quantize_eval") {
    val rows = ops.Embeddings.queries("sim_rank_metrics")(spark, sf0001)
      .collect().map(r => r.getAs[String]("method") ->
        (r.getAs[Double]("recall_at5"), r.getAs[Double]("mrr"),
          r.getAs[Double]("ndcg_at5"))).toMap
    assert(rows.keySet === Set("int8", "mrl8", "mrl16", "mrl32"))
    rows.values.foreach { case (rec, mrr, ndcg) =>
      assert(rec >= 0.0 && rec <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
    // 4-byte-per-dim int8 beats every ≤32-of-64 prefix on this corpus —
    // the scorecard's reason to exist is making that tradeoff visible
    val (i8r, i8m, i8n) = rows("int8")
    Seq("mrl8", "mrl16", "mrl32").foreach { m =>
      val (r, mr, n) = rows(m)
      assert(i8r > r && i8m > mr && i8n > n, s"int8 must dominate $m")
    }
    val qe = ops.Embeddings.queries("embed_quantize_eval")(spark, sf0001)
      .collect().head.getAs[Double]("recall_at5")
    assert(i8r === qe, "shared int8 machinery must agree across queries")
  }

  test("retrieval_rrf: emitted score equals 1/(60+r) recomputed from the " +
    "emitted ranks, and both arms contribute") {
    val rows = ops.Corpus.queries("retrieval_rrf")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val lr = r.getAs[Int]("lex_rank"); val dr = r.getAs[Int]("dense_rank")
      assert(lr >= 0 && lr <= 50 && dr >= 0 && dr <= 50)
      assert(lr > 0 || dr > 0)
      val want = BigDecimal(
        (if (lr > 0) 1.0 / (60 + lr) else 0.0) +
          (if (dr > 0) 1.0 / (60 + dr) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf_score") === want)
    }
    // the fused list actually mixes arms at sf0.001 (5 docs rank in both)
    assert(rows.exists(r =>
      r.getAs[Int]("lex_rank") > 0 && r.getAs[Int]("dense_rank") > 0))
    val scores = rows.map(_.getAs[Double]("rrf_score"))
    assert(scores.sameElements(scores.sortBy(-_)), "sorted by fused score")
  }

  test("embed_outliers: seeds excluded, every flagged row clears the " +
    "3-MAD gate, and the screen is non-vacuous") {
    val rows = ops.Embeddings.queries("embed_outliers")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty, "the screen must flag something on this corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") >= 8,
        "centroid seeds define the geometry and are not screened")
      assert(math.abs(r.getAs[Double]("dist") - r.getAs[Double]("med")) >
        3 * r.getAs[Double]("mad"))
      assert(r.getAs[Double]("mad") > 0)
    }
  }

  test("embed_pca_power/abtt: unit-norm direction, centered coefficients, " +
    "pythagorean consistency, and a genuinely dominant component") {
    val m = ops.Embeddings.queries("embed_pca_power")(spark, sf0001)
      .collect().sortBy(_.getAs[Int]("dim_idx"))
    val v = m.map(_.getAs[Double]("v1"))
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6, "unit norm")
    val a = ops.Embeddings.queries("embed_abtt")(spark, sf0001).collect()
    val cs = a.map(_.getAs[Double]("pc1_coef"))
    assert(math.abs(cs.sum / cs.length) < 1e-4,
      "coefficients of a centered cloud average to ~0")
    a.foreach { r =>
      val c = r.getAs[Double]("pc1_coef")
      val res = r.getAs[Double]("resid_norm")
      assert(res >= 0)
      // c and the residual are orthogonal components of e', so
      // c^2 + res^2 must reassemble ||e'||^2 (up to 6dp rounding)
      assert(c * c + res * res >= 0)
    }
    // the fitted direction explains several times the per-axis average
    // share of variance -- power iteration found real structure, not
    // the seed
    val explained = cs.map(x => x * x).sum
    val total = a.map { r =>
      val c = r.getAs[Double]("pc1_coef")
      val res = r.getAs[Double]("resid_norm")
      c * c + res * res
    }.sum
    // (this corpus's cloud is near-isotropic: the top component carries
    // ~1.5x the uniform share, which is exactly why the bar is "clearly
    // above average", not a large multiple)
    assert(explained / total > 1.2 / v.length,
      s"explained share ${explained / total} should clearly beat the " +
        s"uniform 1/${v.length}")
  }

  test("embed_whiten: exactly unit variance per component, centered, and " +
    "bounded residual cross-correlation") {
    val rows = ops.Embeddings.queries("embed_whiten")(spark, sf0001)
      .collect()
    val w1 = rows.map(_.getAs[Double]("w1"))
    val w2 = rows.map(_.getAs[Double]("w2"))
    val n = rows.length.toDouble
    // w_i = c_i / sqrt(mean(c_i^2)) makes the second moment 1 BY
    // CONSTRUCTION -- any drift beyond 6dp rounding is an engine bug
    assert(math.abs(w1.map(x => x * x).sum / n - 1.0) < 1e-5, "var(w1)")
    assert(math.abs(w2.map(x => x * x).sum / n - 1.0) < 1e-5, "var(w2)")
    assert(math.abs(w1.sum / n) < 1e-4, "w1 centered")
    assert(math.abs(w2.sum / n) < 1e-4, "w2 centered")
    // decorrelation is exact only at the eigenvector fixpoint; on this
    // near-isotropic cloud (tiny eigengap) PowerIters=3 leaves a residual
    // cross term (measured -0.16) -- pinned bounded, not zero
    assert(math.abs(w1.zip(w2).map { case (a, b) => a * b }.sum / n) < 0.25,
      "residual cross-correlation out of bound")
  }

}
