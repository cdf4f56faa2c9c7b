package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixAggSpec extends SparkSpec {
  import spark.implicits._

  // sparse ids (including negatives) over a tiny bucket so the data
  // spans many buckets AND many super-buckets — all three levels of
  // the decomposition carry real values
  private val rnd = new scala.util.Random(7)
  private val rows =
    (-100 until 400).map(i => (i.toLong * 97, rnd.nextInt(1000).toLong))

  test("prefixSumExclusive equals the naive global window at every row") {
    val df = rows.toDF("o", "v")
    val w = Window.orderBy(col("o")).rowsBetween(Window.unboundedPreceding, -1)
    val naive = df.withColumn("p", coalesce(sum(col("v")).over(w), lit(0L)))
      .select(col("o"), col("p")).as[(Long, Long)].collect().sortBy(_._1)
    val got = PrefixAgg.prefixSumExclusive(df, "o", "v", "p", bucket = 2L)
      .select(col("o"), col("p")).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
  }

  test("prefixMax equals the naive global window at every row") {
    val df = rows.toDF("o", "v")
    val w = Window.orderBy(col("o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("p", max(col("v")).over(w))
      .select(col("o"), col("p")).as[(Long, Long)].collect().sortBy(_._1)
    val got = PrefixAgg.prefixMax(df, "o", "v", "p", bucket = 2L)
      .select(col("o"), col("p")).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
  }

  test("original columns survive and bucket size does not change values") {
    val df = rows.take(50).toDF("o", "v").withColumn("tag", lit("x"))
    val a = PrefixAgg.prefixMax(df, "o", "v", "p", bucket = 2L)
    assert(a.columns.toSeq == Seq("o", "v", "tag", "p"))
    val b = PrefixAgg.prefixMax(df, "o", "v", "p", bucket = 512L)
      .select(col("o"), col("p")).as[(Long, Long)].collect().sortBy(_._1)
    val aVals = a.select(col("o"), col("p"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(aVals.toSeq == b.toSeq)
  }
}
