package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-preparation (Corpus) and embedding
  * (Embeddings) operators, beyond the DuckDB hash oracle: the oracle pins
  * cross-engine equality, these pin that the MATH means what it claims.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("text_repetition ratios are well-formed and detect planted dups") {
    val rows = ops.Corpus.queries("text_repetition")(spark, sf0001)
      .select("distinct_tok_ratio", "top_bigram_frac", "dup_bigram_frac")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (dt, tb, db) =>
      assert(dt > 0 && dt <= 1.0, s"distinct_tok_ratio out of range: $dt")
      assert(tb > 0 && tb <= 1.0, s"top_bigram_frac out of range: $tb")
      assert(db >= 0 && db < 1.0, s"dup_bigram_frac out of range: $db")
    }
    // word-soup corpus: bigrams DO repeat, so some doc must show dups
    assert(rows.exists(_._3 > 0), "expected some duplicate bigrams")
  }

  test("dedup_span keeps exactly the distinct span texts, loses some") {
    val got = ops.Corpus.queries("dedup_span")(spark, sf0001)
    val (nSpans, nKept) = got.agg(sum("n_spans"), sum("n_kept"))
      .as[(Long, Long)].head()
    assert(nKept <= nSpans)
    assert(nKept < nSpans,
      "planted near-dup docs share 16-token spans; dedup must drop some")
    // global invariant: kept spans == distinct span texts in the corpus
    val docs = Tables.documents(spark, sf0001)
    val distinctSpans = docs
      .select(col("doc_id"), posexplode(split(lower(col("text")), " "))
        .as(Seq("pos", "tok")))
      .groupBy(col("doc_id"), expr("pos div 16").as("span"))
      .agg(collect_list(struct(col("pos"), col("tok"))).as("raw"))
      .select(concat_ws(" ",
        transform(array_sort(col("raw")), x => x.getField("tok"))).as("sp"))
      .distinct().count()
    assert(nKept === distinctSpans)
  }

  test("text_pii_redact finds and removes the planted email and phone") {
    val got = ops.Corpus.queries("text_pii_redact")(spark, sf0001)
    val bad = got.filter(col("n_email") =!= 1 || col("n_phone") =!= 1).count()
    assert(bad === 0, "every row carries exactly one planted email + phone")
    // the redacted hash must differ from the unredacted augmented text's
    val aug = concat(col("text"), lit(" contact "), col("source"),
      lit("@example.com or call +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val rawHash = Tables.documents(spark, sf0001)
      .select(col("doc_id"), substring(sha2(aug, 256), 1, 16).as("raw_hash"))
    val same = got.join(rawHash, "doc_id")
      .filter(col("red_hash") === col("raw_hash")).count()
    assert(same === 0, "redaction must change every augmented text")
  }

  test("text_normalize strips symbols: suffix collapses to 'mixed case 42'") {
    // every doc text is already lowercase alnum+space, so the normalized
    // form is exactly text + ' mixed case 42'
    val expect = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        length(concat(col("text"), lit(" mixed case 42"))).cast("long")
          .as("want_len"))
    val got = ops.Corpus.queries("text_normalize")(spark, sf0001)
    val off = got.join(expect, "doc_id")
      .filter(col("n_norm") =!= col("want_len")).count()
    assert(off === 0)
  }

  test("text_vocab ranks 20 tokens with consistent df/idf") {
    val rows = ops.Corpus.queries("text_vocab")(spark, sf0001)
      .select("rk", "cnt", "df", "idf").as[(Int, Long, Long, Double)]
      .collect()
    assert(rows.length === 20)
    assert(rows.map(_._1).toSeq === (1 to 20))
    // cnt non-increasing in rank; df <= corpus size; idf >= 0
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, "cnt must be non-increasing in rank")
    }
    rows.foreach { case (_, cnt, df, idf) =>
      assert(df <= 500 && df >= 1 && cnt >= df)
      assert(idf >= 0.0)
    }
  }

  test("text_fertility: ratios recompute from the integer sums and " +
    "bytes can never undercount chars") {
    val rows = ops.Corpus.queries("text_fertility")(spark, sf0001).collect()
    assert(rows.length === 5) // de/en/es/fr/zh
    rows.foreach { r =>
      val tok = r.getAs[Long]("n_tokens"); val ch = r.getAs[Long]("n_chars")
      val by = r.getAs[Long]("n_bytes")
      assert(by >= ch, "UTF-8 bytes >= characters always")
      def rnd(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("chars_per_tok") === rnd(ch.toDouble / tok))
      assert(r.getAs[Double]("bytes_per_tok") === rnd(by.toDouble / tok))
    }
  }

  test("curate_ccnet_buckets: per-lang terciles partition the docs, " +
    "sizes differ by at most one, and mean_nll orders head<middle<tail") {
    val rows = ops.Corpus.queries("curate_ccnet_buckets")(spark, sf0001)
      .collect()
    val langCounts = Tables.documents(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, bs) =>
      assert(bs.length === 3, s"$lang must have 3 buckets")
      assert(bs.map(_.getAs[Long]("n_docs")).sum === langCounts(lang))
      val sizes = bs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, "ntile sizes differ by <= 1")
      val byId = bs.sortBy(_.getAs[Int]("bucket_id"))
      assert(byId.map(_.getAs[String]("bucket")).toSeq ===
        Seq("head", "middle", "tail"))
      // ranked by avg_nll ascending -> bucket means must be non-decreasing
      val means = byId.map(_.getAs[Double]("mean_nll"))
      assert(means(0) <= means(1) && means(1) <= means(2),
        s"$lang bucket means not ordered: ${means.toSeq}")
    }
    // the LM is English-trained: en's head must score better (lower nll)
    // than zh's head, or the strata carry no signal
    def headOf(l: String) = rows.find(r => r.getAs[String]("lang") == l &&
      r.getAs[Int]("bucket_id") == 1).get.getAs[Double]("mean_nll")
    assert(headOf("en") < headOf("zh"))
  }

  test("text_oov_rate: rates bounded and recomputable, English lowest " +
    "against its own vocabulary") {
    val rows = ops.Corpus.queries("text_oov_rate")(spark, sf0001).collect()
    assert(rows.length === 5)
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val nt = r.getAs[Long]("n_tok"); val no = r.getAs[Long]("n_oov")
      assert(no <= nt)
      assert(r.getAs[Long]("n_oov_types") <= no)
      assert(r.getAs[Double]("oov_rate") === rnd(no.toDouble / nt))
    }
    val byLang = rows.map(r =>
      r.getAs[String]("lang") -> r.getAs[Double]("oov_rate")).toMap
    assert(byLang("en") === byLang.values.min,
      "vocab is built from en — en must have the lowest OOV rate")
    assert(byLang.values.exists(_ > byLang("en")),
      "some other language must actually fall outside the en vocab")
  }

  test("embed_norm: u0 is a unit-vector component, norms positive") {
    val rows = ops.Embeddings.queries("embed_norm")(spark, sf0001)
      .select("dim", "l2_norm", "u0").as[(Long, Double, Double)].collect()
    assert(rows.length === 500)
    rows.foreach { case (dim, l2, u0) =>
      assert(dim === 64L)
      assert(l2 > 0.0)
      assert(math.abs(u0) <= 1.0 + 1e-9)
    }
  }

  test("embed_quantize saturates the max element and bounds the rest") {
    val rows = ops.Embeddings.queries("embed_quantize")(spark, sf0001)
      .select("dim", "checksum", "n_sat").as[(Long, Long, Long)].collect()
    assert(rows.length === 500)
    rows.foreach { case (dim, checksum, nSat) =>
      assert(dim === 64L)
      // |qv| <= 127 per element => |checksum| <= 127*dim
      assert(math.abs(checksum) <= 127L * dim)
      // the max-|x| element quantizes to exactly +/-127
      assert(nSat >= 1, "max element must saturate")
    }
  }

  test("embed_centroid assigns each centroid to itself at distance 0") {
    val got = ops.Embeddings.queries("embed_centroid")(spark, sf0001)
    val self = got.filter(col("vec_id") < 8)
      .select("vec_id", "centroid_id", "dist")
      .as[(Long, Long, Double)].collect()
    assert(self.length === 8)
    self.foreach { case (v, c, dist) =>
      assert(v === c, s"vec $v should be its own centroid, got $c")
      assert(dist === 0.0)
    }
    // total assignment: every vector gets exactly one centroid
    assert(got.count() === 500)
    assert(got.filter(col("centroid_id") >= 8 || col("centroid_id") < 0)
      .count() === 0)
  }

  test("embed_pq: codebook vectors self-encode at zero error") {
    val got = ops.Embeddings.queries("embed_pq")(spark, sf0001).cache()
    assert(got.count() === 500)
    // vec k < 16 IS sub-centroid k in every subspace: code = k·Σ16^s =
    // k·0x11111111, err = 0 — the self-encoding identity of a seeded
    // codebook
    val unit = 0x11111111L // Σ 16^s for s = 0..7
    val seeds = got.filter(col("vec_id") < 16)
      .select("vec_id", "code", "err").as[(Long, Long, Double)].collect()
    assert(seeds.length === 16)
    seeds.foreach { case (v, code, err) =>
      assert(code === v * unit, s"vec $v code $code != ${v * unit}")
      assert(err === 0.0, s"seed vec $v reconstruction error $err")
    }
    // codes are 32-bit words; errors non-negative
    assert(got.filter(col("code") < 0 || col("code") > 0xFFFFFFFFL)
      .count() === 0)
    assert(got.filter(col("err") < 0).count() === 0)
    got.unpersist()
    ()
  }

  test("text_winnow: fingerprints are a bounded, non-empty selection") {
    val fp = ops.Corpus.queries("text_winnow")(spark, sf0001)
      .join(Tables.documents(spark, sf0001)
        .select(col("doc_id"), size(ops.toks).as("n_tok")), "doc_id")
      .select("doc_id", "n_fp", "min_fp", "max_fp", "n_tok")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(fp.nonEmpty)
    fp.foreach { case (id, n, mn, mx, nTok) =>
      // windows = n_grams - 3 = n_tok - 5; selection is ≥1 and can never
      // exceed the window count (w-sized windows each pick one hash)
      val nWindows = nTok - 5
      assert(n >= 1 && n <= nWindows.max(1),
        s"doc $id: $n fingerprints from $nWindows windows")
      assert(mn <= mx)
    }
    // winnowing stores ~2/(w+1) of hashes — the corpus-wide density must
    // be well under 1 (the whole point of the scheme)
    val (nFp, nWin) = (fp.map(_._2).sum, fp.map(r => (r._5 - 5).max(1)).sum)
    assert(nFp.toDouble / nWin < 0.8, s"selection not sparse: $nFp/$nWin")
  }

  test("sample_weighted: exactly 3 per source, keys ordered, reproducible") {
    val q = ops.Curation.queries("sample_weighted")
    val a = q(spark, sf0001).collect()
    // structure: every source contributes exactly rn = 1, 2, 3
    val bySrc = a.groupBy(_.getString(0))
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3), src)
      // ES keys are ln(u)/w with u < 1: strictly negative, descending in rn
      val keys = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(keys.forall(_ < 0))
      assert(keys.sorted(Ordering[Double].reverse).toSeq === keys.toSeq)
    }
    // content-stable: a re-run draws the identical sample
    assert(q(spark, sf0001).collect().toSeq === a.toSeq)
  }

  test("text_bm25: positive descending scores, probe doc retrieved") {
    val got = ops.Corpus.queries("text_bm25")(spark, sf0001)
      .select("doc_id", "score", "n_terms")
      .as[(Long, Double, Long)].collect()
    assert(got.length === 20)
    // the probe doc matches every query term by construction — it must
    // surface in the top-20 (though tf-density can rank others above it)
    assert(got.exists(_._1 === 0L), "probe doc missing from its own top-20")
    // +1-style idf keeps every term contribution positive
    got.foreach { case (id, s, nt) =>
      assert(s > 0, s"non-positive BM25 score $s for doc $id")
      assert(nt >= 1, s"doc $id retrieved with zero matching terms")
    }
    // the declared ordering (score desc, doc_id asc) is what came back
    assert(got.sortBy(r => (-r._2, r._1)).toSeq === got.toSeq)
  }

  test("dedup_semantic: cluster minima kept, dups real, partition total") {
    val got = ops.Embeddings.queries("dedup_semantic")(spark, sf0001).cache()
    // every vector classified exactly once, verdict is binary
    assert(got.count() === 500)
    assert(got.select("vec_id").distinct().count() === 500)
    assert(got.filter(col("kept") =!= 0 && col("kept") =!= 1).count() === 0)
    // the lowest vec_id of each cell has no earlier in-cell neighbor by
    // construction — the keep-first rule must never drop it
    val mins = got.groupBy("centroid_id")
      .agg(org.apache.spark.sql.functions.min("vec_id").as("vec_id"))
    assert(got.join(mins, Seq("centroid_id", "vec_id"))
      .filter(col("kept") === 0).count() === 0)
    // threshold is meaningful on this corpus: some semantic near-dups are
    // dropped, but the corpus doesn't collapse
    val nDup = got.filter(col("kept") === 0).count()
    assert(nDup > 0 && nDup < 250, s"implausible dup count $nDup")
    got.unpersist()
    ()
  }

  test("text_lm_score discriminates: English scores below non-English") {
    // the LM is trained on the English slice, so the perplexity proxy must
    // separate in-distribution from out-of-distribution docs on average —
    // the property the CCNet-style filter exists for.
    val scored = ops.Corpus.queries("text_lm_score")(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select("doc_id", "lang"), "doc_id")
    val avg = scored.groupBy(($"lang" === "en").as("is_en"))
      .agg(org.apache.spark.sql.functions.avg("avg_nll").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(avg(true) < avg(false),
      s"en=${avg(true)} must beat non-en=${avg(false)}")
  }

  test("text_entropy: bounded by ln(n_types), matches a brute-force doc") {
    val got = ops.Corpus.queries("text_entropy")(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length ===
      Tables.documents(spark, sf0001).count().toInt)
    got.foreach { case (id, nTok, nTypes, h) =>
      assert(h >= 0.0, s"doc $id negative entropy $h")
      // uniform distribution maximizes H at ln(n_types); allow the 6dp
      // per-term rounding to push marginally over
      assert(h <= math.log(nTypes.toDouble) + 1e-4,
        s"doc $id entropy $h exceeds ln($nTypes)")
      assert(nTypes <= nTok)
    }
    // brute-force one doc
    val (id0, _, _, h0) = got.head
    val text = Tables.documents(spark, sf0001)
      .filter($"doc_id" === id0).select("text").as[String].head()
    val counts = text.toLowerCase(java.util.Locale.ROOT).split(" ")
      .groupBy(identity).values.map(_.length).toSeq
    val n = counts.sum.toDouble
    val brute = counts.map { c =>
      BigDecimal(-(c / n) * math.log(c / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(h0 - brute) < 1e-6, s"doc $id0: $h0 vs brute $brute")
  }

  test("bpe_pair_count: rank-1 matches an independent brute-force count") {
    val got = ops.Corpus.queries("bpe_pair_count")(spark, sf0001)
      .as[(Int, String, Long)].collect()
    assert(got.length === 20)
    assert(got.map(_._1).toSeq === (1 to 20))
    got.foreach { case (_, p, n) =>
      assert(p.length === 2, s"pair '$p' is not 2 chars")
      assert(n > 0)
    }
    // non-increasing frequency down the ranks
    got.sliding(2).foreach { case Array(a, b) => assert(a._3 >= b._3) }
    // brute force on the 50-doc slice: count weighted char bigrams
    val texts = Tables.documents(spark, sf0001)
      .select("text").as[String].collect()
    val brute = texts.iterator
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split(" "))
      .filter(_.length >= 2)
      .flatMap(t => t.sliding(2))
      .foldLeft(Map.empty[String, Long].withDefaultValue(0L)) {
        (m, p) => m.updated(p, m(p) + 1)
      }
    val (topPair, topN) = brute.toSeq.sortBy { case (p, n) => (-n, p) }.head
    assert(got.head._2 === topPair && got.head._3 === topN,
      s"rank-1 ${got.head} != brute ($topPair, $topN)")
  }

  test("dq_drift_psi: 10 non-negative terms, counts conserve the slices") {
    val got = ops.Corpus.queries("dq_drift_psi")(spark, sf0001)
      .as[(Int, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq === (0 to 9))
    // (p-q)·ln(p/q) has matching signs in both factors — every term >= 0
    got.foreach { case (b, _, _, t) =>
      assert(t >= 0.0, s"bucket $b psi_term $t negative") }
    val docs = Tables.documents(spark, sf0001)
    val nEven = docs.filter($"doc_id" % 2 === 0).count()
    val nOdd = docs.filter($"doc_id" % 2 === 1).count()
    assert(got.map(_._2).sum === nEven)
    assert(got.map(_._3).sum === nOdd)
  }

  test("dq_outlier_mad: flags exactly the docs outside the 3-MAD band") {
    val got = ops.Corpus.queries("dq_outlier_mad")(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty, "word-soup lengths should produce some outliers")
    got.foreach { case (src, id, x, med, mad) =>
      assert(math.abs(x - med) > 3 * mad,
        s"$src/$id inside the band: |$x - $med| <= 3*$mad")
    }
    // independent per-source median/MAD on the small slice
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val bySrc = Tables.documents(spark, sf0001)
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val expected = bySrc.toSeq.flatMap { case (src, rows) =>
      val med = median(rows.map(_._3.toDouble).toSeq)
      val mad = median(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.filter(r => math.abs(r._3 - med) > 3 * mad)
        .map(r => (src, r._2))
    }.toSet
    assert(got.map(r => (r._1, r._2)).toSet === expected)
  }

  test("text_lm_bigram: English scores below non-English under the " +
    "en-trained model; brute-force agreement on one doc") {
    val res = ops.Corpus.queries("text_lm_bigram")(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(res.forall(_._3 > 0.0))
    val langs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val (en, other) = res.partition(r => langs(r._1) == "en")
    assert(mean(en.map(_._3).toSeq) < mean(other.map(_._3).toSeq),
      "bigram NLL must discriminate the training language")
    // brute force on the first doc: stupid backoff over collected counts
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val refToks = docs.filter(_._2 == "en")
      .flatMap(_._3.toLowerCase.split(" "))
    val c1 = refToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val refBgs = docs.filter(_._2 == "en").flatMap(d =>
      d._3.toLowerCase.split(" ").sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
    val c12 = refBgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nRef, vRef) = (refToks.length.toLong, c1.size.toLong)
    val probe = docs.minBy(_._1)
    val toks = probe._3.toLowerCase.split(" ")
    val terms = toks.sliding(2).filter(_.length == 2).map { a =>
      val s = c12.get((a(0), a(1))) match {
        case Some(n) => n.toDouble / c1(a(0))
        case None => 0.4 * (c1.getOrElse(a(1), 0L) + 1).toDouble /
          (nRef + vRef).toDouble
      }
      BigDecimal(math.round(-math.log(s) * 10000).toDouble / 10000)
    }.toSeq
    val want = (terms.sum / terms.length).toDouble
    val got = res.find(_._1 == probe._1).get
    assert(got._2 === terms.length.toLong)
    assert(math.abs(got._3 - want) < 1e-9, s"${got._3} vs $want")
  }

  test("dq_drift_ks: statistic matches a brute-force CDF walk, " +
    "bounded in [0,1]") {
    val Array((atValue, ks, nr, nc)) =
      ops.Corpus.queries("dq_drift_ks")(spark, sf0001)
        .as[(Long, Double, Long, Long)].collect()
    assert(ks >= 0.0 && ks <= 1.0)
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val ref = docs.filter(_._1 % 2 == 0).map(_._2).sorted
    val cur = docs.filter(_._1 % 2 == 1).map(_._2).sorted
    assert(nr === ref.length.toLong && nc === cur.length.toLong)
    val spine = (ref ++ cur).distinct.sorted
    val brute = spine.map { v =>
      val d = math.abs(
        ref.count(_ <= v).toDouble / ref.length -
          cur.count(_ <= v).toDouble / cur.length)
      (v, d)
    }
    val best = brute.maxBy { case (v, d) => (d, -v) }
    assert(ks === best._2 && atValue === best._1)
  }

  test("text_compress_ratio: bounds hold, repetitive text compresses " +
    "below natural text, counts match an independent deflate") {
    val got = ops.Corpus.queries("text_compress_ratio")(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length ===
      Tables.documents(spark, sf0001).count())
    got.foreach { case (id, nb, nd, r) =>
      assert(nb > 0 && nd > 0, s"doc $id: empty sizes")
      assert(math.abs(r - nd.toDouble / nb) < 1e-12)
      // deflate overhead is bounded: never blows past ~1.1x + header
      assert(nd <= nb + 64, s"doc $id: deflate expanded $nb -> $nd")
    }
    // discrimination: a pathologically repetitive doc vs the corpus median
    val byId = got.map(r => r._1 -> r._4).toMap
    val repetitive = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
      .minBy { case (_, t) =>
        t.split(" ").distinct.length.toDouble / math.max(1, t.split(" ").length) }
    val ratios = got.map(_._4).sorted
    val median = ratios(ratios.length / 2)
    assert(byId(repetitive._1) < median,
      "the most repetitive doc must compress below the corpus median")
    // determinism within this zlib: one independent re-deflate agrees
    val d = new java.util.zip.Deflater(6)
    val bytes = repetitive._2
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](1 << 20)
    val n = d.deflate(buf)
    assert(got.find(_._1 == repetitive._1).get._3 === n.toLong)
  }

  test("dedup_exact_norm: a reformatted copy collapses onto its original " +
    "while byte-exact dedup misses it (L91)") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "The QUICK, brown   fox!!"), // reformatted copy of doc 0
      (2L, "a different document"))
    val dir = java.nio.file.Files.createTempDirectory("norm").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = ops.Corpus.queries("dedup_exact_norm")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._3, r._4)).toSeq ===
      Seq((0L, 2L, 1), (1L, 2L, 0), (2L, 1L, 1)))
    assert(got(0)._2 === got(1)._2, "same normalized hash")
    // byte-exact dedup keeps all three (the gap this operator closes)
    assert(docs.map(_._2).distinct.length === 3)
    // and the real corpus: keepers + dropped variants partition the table
    val full = ops.Corpus.queries("dedup_exact_norm")(spark, sf0001)
      .as[(Long, Long, Long, Int)].collect()
    assert(full.length.toLong === Tables.documents(spark, sf0001).count())
    full.groupBy(_._2).foreach { case (_, g) =>
      assert(g.count(_._4 == 1) === 1) }
  }

  test("text_js_divergence: matches the brute-force JS walk, symmetric, " +
    "bounded by ln 2 (L89)") {
    val Array((vocab, tr, tc, js)) =
      ops.Corpus.queries("text_js_divergence")(spark, sf0001)
        .as[(Long, Long, Long, Double)].collect()
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(lower(col("text")), " "))
        .as("tok")).as[(Long, String)].collect()
    val ref = toks.filter(_._1 % 2 == 0).groupBy(_._2)
      .map { case (t, xs) => t -> xs.length.toLong }
    val cur = toks.filter(_._1 % 2 == 1).groupBy(_._2)
      .map { case (t, xs) => t -> xs.length.toLong }
    assert(tr === ref.values.sum && tc === cur.values.sum)
    assert(vocab === (ref.keySet ++ cur.keySet).size.toLong)
    def jsOf(a: Map[String, Long], b: Map[String, Long]): Double = {
      val (ta, tb) = (a.values.sum.toDouble, b.values.sum.toDouble)
      (a.keySet ++ b.keySet).toSeq.map { t =>
        val p = a.getOrElse(t, 0L) / ta; val q = b.getOrElse(t, 0L) / tb
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) / 2 else 0.0) +
          (if (q > 0) q * math.log(q / m) / 2 else 0.0)
      }.sum
    }
    val jsRef = jsOf(ref, cur)
    assert(math.abs(js - jsRef) < 1e-6, s"$js vs $jsRef")
    assert(math.abs(jsRef - jsOf(cur, ref)) < 1e-12, "symmetric")
    assert(js >= 0.0 && js <= math.log(2) + 1e-9)
  }

  test("dedup_substring: accounting identities hold, both flag classes " +
    "populated, and the winnowing guarantee catches every brute-force " +
    "shared 6-token run") {
    val rows = ops.Corpus.queries("dedup_substring")(spark, sf0001).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tok"); val dup = r.getAs[Long]("dup_tok")
      assert(dup >= 0 && dup <= n, s"dup_tok $dup outside [0, $n]")
      assert(r.getAs[Long]("kept_tok") == n - dup, "kept + dup != n_tok")
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Boolean]("mostly_dup") == (ratio >= 0.5))
    }
    assert(rows.exists(_.getAs[Boolean]("mostly_dup")), "no heavy dups")
    assert(rows.exists(!_.getAs[Boolean]("mostly_dup")), "all heavy dups")
    // brute-force truth: every doc containing a 6-token run that appears
    // verbatim in ANOTHER doc must be attributed dup mass (the w+k-1 = 6
    // winnowing guarantee, checked without winnowing)
    val runs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.ops.toks.as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 6), i -> " +
          "array_join(slice(t, i + 1, 6), ' '))")).as("run"))
    val mustFlag = runs.groupBy("run")
      .agg(countDistinct("doc_id").as("nd"), collect_set("doc_id").as("ds"))
      .filter(col("nd") >= 2)
      .select(explode(col("ds")).as("doc_id")).distinct()
      .collect().map(_.getLong(0))
    assert(mustFlag.nonEmpty, "vacuous truth: no cross-doc 6-token runs")
    mustFlag.foreach { id =>
      assert(byDoc(id).getAs[Long]("dup_tok") >= 6,
        s"doc $id shares a 6-token run but dup_tok < 6")
    }
  }
}
