package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}
import graft.ops.{dsum, exactSum}

/** Determinism and robustness properties (SURVEY.md §5.2 #3).
  *
  * The central claim behind every oracle-checked aggregate: decimal
  * accumulation (dsum/exactSum) is invariant to physical data layout, while
  * plain double summation is not — that invariance is what makes results
  * reproducible across partition counts, engines, and reruns.
  */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }

  test("dsum is bitwise invariant to partition count (scalacheck)") {
    val gen = org.scalacheck.Gen.listOfN(200,
      org.scalacheck.Gen.chooseNum(-1e6, 1e6).map(v => math.round(v * 100) / 100.0))
    check(Prop.forAll(gen) { xs: List[Double] =>
      val results = Seq(1, 3, 7, 32).map { n =>
        spark.createDataset(xs).repartition(n).toDF("v")
          .agg(dsum(col("v"), 2)).as[Double].collect().head
      }
      results.distinct.size == 1
    })
  }

  test("exactSum over shuffled row order equals sorted order") {
    val li = Tables.lineitem(spark, sf0001).select("l_extendedprice")
    val a = li.orderBy(rand(7)).agg(exactSum(col("l_extendedprice")))
      .collect().head.getDecimal(0)
    val b = li.orderBy("l_extendedprice").agg(exactSum(col("l_extendedprice")))
      .collect().head.getDecimal(0)
    assert(a === b)
  }

  test("approx_count_distinct is within its advertised error bound") {
    val o = Tables.orders(spark, sf0001)
    val exact = o.agg(countDistinct(col("o_custkey"))).as[Long].collect().head
    // default rsd = 5%; allow 3 sigma
    val approx = o.agg(approx_count_distinct(col("o_custkey")))
      .as[Long].collect().head
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"HLL estimate $approx too far from exact $exact")
  }

  test("CDC latest-wins compaction equals sequential replay (scalacheck)") {
    // the cdc_apply oracle row pins ONE synthetic log; this pins the
    // compaction pattern itself — max_by(state, seq) + tombstone drop must
    // equal replaying any ordered log entry by entry
    import org.scalacheck.Gen
    val genLog = for {
      nKeys <- Gen.chooseNum(1, 8)
      entries <- Gen.listOfN(60, for {
        k <- Gen.chooseNum(0, nKeys)
        op <- Gen.oneOf("I", "U", "D")
        v <- Gen.chooseNum(0, 1000)
      } yield (k.toLong, op, v.toDouble))
    } yield entries.zipWithIndex.map { case ((k, op, v), i) =>
      (k, i.toLong, op, v)
    }
    check(Prop.forAll(genLog) { log: List[(Long, Long, String, Double)] =>
      val compacted = log.toDF("k", "seq", "op", "v")
        .groupBy("k")
        .agg(max_by(struct(col("op"), col("v")), col("seq")).as("last"))
        .filter(col("last.op") =!= "D")
        .select(col("k"), col("last.v").as("v"))
        .as[(Long, Double)].collect().toMap
      val replay = scala.collection.mutable.Map[Long, Option[Double]]()
      log.sortBy(_._2).foreach { case (k, _, op, v) =>
        replay(k) = if (op == "D") None else Some(v)
      }
      compacted == replay.collect { case (k, Some(v)) => k -> v }.toMap
    })
  }

  test("CSV round-trip preserves quoted commas (reference's naive-split bug)") {
    // daily_csv_pipeline.py:96-104 splits raw CSV text on ',' and corrupts
    // titles containing commas; spark.read.csv with quoting must not.
    val dir = java.nio.file.Files.createTempDirectory("graft_csvq_").toString
    val rows = Seq((1L, """Mission: Impossible — Dead, Reckoning"""),
      (2L, "Plain Title"), (3L, "\"Quoted\", and, commas"))
    rows.toDF("code", "title").write.mode("overwrite")
      .option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("code BIGINT, title STRING").csv(dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back === rows)
  }
}
