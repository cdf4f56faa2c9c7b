package graft.sources

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables sort-merge join with zero exchanges") {
    val left = (1L to 2000L).map(i => (i, s"o$i")).toDF("k", "o")
    val right = (1L to 4000L).map(i => (i % 2000 + 1, s"l$i")).toDF("k", "l")
    Bucketing.writeBucketed(left, "b_orders", "k", 8)
    Bucketing.writeBucketed(right, "b_lineitem", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cogroupJoin(spark, "b_orders", "b_lineitem", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 4000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
