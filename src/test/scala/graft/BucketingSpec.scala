package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (builder brief: "bucketing for co-located
  * joins"): both sides bucketed by the join key at write time join WITHOUT
  * a shuffle on either side — at 100 TB this removes the dominant exchange
  * from every recurring fact⋈fact join on the bucket key.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans with zero exchanges") {
    val o = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf0001).select("c_custkey", "c_name")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    c.withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (at 100 TB neither side broadcasts);
      // bucketing must then satisfy the join's distribution with NO shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      val n = joined.count()
      assert(n === o.join(c, o("o_custkey") === c("c_custkey")).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"),
        s"scan did not use buckets:\n${plan.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("join_bucketed's staged join is exchange-free below the join") {
    // the declared query's staging helper: both sides written bucketed on
    // the custkey join key, then sort-merge joined — the layout satisfies
    // the join's distribution requirement, so NO exchange appears anywhere
    // in the join subtree (the hint pins the strategy, the buckets kill
    // the shuffle)
    val j = ops.Joins.bucketedOrdersCustomer(spark, sf0001)
    assert(j.count() > 0)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(1500)}")
    assert(plan.contains("Bucketed: true"), plan.take(1500))
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the OTHER half of the skew story beside Skew.saltedJoin: with AQE's
    // skew-join rewrite, a hot key's oversized shuffle partition is split
    // into parallel sub-joins AT RUNTIME, no salting rewrite needed. The
    // thresholds are shrunk so the local fixture trips the same code path
    // a 100 TB hot key would; the salted join remains the escape hatch for
    // engines/paths AQE can't touch (e.g. aggregations over the hot key).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // left: one hot key (0) carrying 200k rows + a uniform tail;
      // right: small per-key dimension — the classic hot-join shape
      val left = spark.range(200000).select(lit(0L).as("k"), col("id"))
        .union(spark.range(20000).select((col("id") % 64 + 1).as("k"),
          col("id")))
      val right = spark.range(65).select(col("id").as("k"),
        (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataframe's plan (count() builds a different query
      // execution, leaving joined's adaptive plan unfinalized)
      assert(joined.collect().length === 220000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom-filter join pruning injects on a selective dim join") {
    // The third shuffle-reduction lever beside bucketing and AQE skew
    // handling: when one join side carries a selective filter, Catalyst
    // can inject a bloom_filter_agg on that side and a might_contain
    // probe on the fact scan, shrinking the shuffled fact rows BEFORE the
    // exchange — at 100 TB this is the difference between shuffling the
    // full fact table and shuffling only rows that can possibly match.
    // Thresholds are shrunk so the local fixture trips the same rewrite a
    // production fact⋈filtered-dim join would.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, sf0001)
      val o = Tables.orders(spark, sf0001).filter($"o_totalprice" > 450000)
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg") && opt.contains("might_contain"),
        s"runtime bloom filter not injected:\n${opt.take(1500)}")
      // the rewrite must not change results
      val expected = li.join(o.hint("broadcast"),
        li("l_orderkey") === o("o_orderkey")).count()
      assert(j.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
