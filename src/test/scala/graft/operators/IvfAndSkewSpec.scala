package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("IVF with full probe matches brute force exactly") {
    val rnd = new Random(1)
    val emb = (0L until 60L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 5)
    val index = Similarity.buildIvf(emb, nCentroids = 4)
    // nprobe = all centroids -> exact search
    val ivf = Similarity.ivfTopK(index, queries, k = 3, nprobe = 4)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().sorted
    val brute = Similarity.bruteForceTopK(emb, queries, 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().sorted
    assert(ivf.toSeq == brute.toSeq)
  }

  test("IVF index persisted by bucket prunes partitions on probe") {
    // the scale claim on IvfIndex: persist `assigned` partitioned by
    // bucket, and a probe's bucket filter becomes partition pruning —
    // unprobed buckets are never read
    val rnd = new Random(7)
    val emb = (0L until 80L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val index = Similarity.buildIvf(emb, nCentroids = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    index.assigned.write.partitionBy("bucket").parquet(dir)
    val back = spark.read.parquet(dir).filter($"bucket".isin(0, 1))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("bucket"), plan)
    // pruned read returns exactly the probed buckets' vectors
    val expected = index.assigned.filter($"bucket".isin(0, 1))
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val got = back.select($"vec_id").as[Long].collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("IVF with narrow probe still returns k ranked neighbors per query") {
    val rnd = new Random(2)
    val emb = (0L until 80L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val index = Similarity.buildIvf(emb, nCentroids = 8)
    val got = Similarity.ivfTopK(index, emb.filter($"vec_id" < 3), 3, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == (1 to rs.size) && rs.size <= 3 })
  }

  test("salted inner join equals plain inner join") {
    val rnd = new Random(3)
    // skewed: 90% of rows share key 0
    val big = (1 to 500)
      .map(i => (if (rnd.nextDouble() < 0.9) 0L else i.toLong % 7, i))
      .toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .as[(Long, Int, String)].collect().sorted
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salt = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("two-phase count equals plain count") {
    val df = (1 to 300).map(i => ("k" + (i % 3), i)).toDF("k", "v")
    val plain = df.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val two = SkewJoin.twoPhaseCount(df, "k", salt = 4)
      .as[(String, Long)].collect().toMap
    assert(two == plain)
  }
}
