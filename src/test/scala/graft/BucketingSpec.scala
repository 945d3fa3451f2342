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
}
