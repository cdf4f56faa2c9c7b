package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The learned-KMeans IVF path's pinnable properties — everything about
 * `sim_ivf_topk` that ISN'T the learned model itself (which the driver
 * oracle gates on rows+schema only, by design):
 * determinism under the fixed seed, exact output shape, and a recall
 * floor against the brute-force ground truth (measured 0.51 at
 * sf0.001 / 0.69 at sf0.01 with nprobe=4 of 16 on the near-uniform
 * synthetic corpus — the worst case for a clustered index; the floor
 * asserts the index is genuinely ranking, not returning arbitrary
 * bucket-mates).
 */
class IvfLearnedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb =
    graft.sources.ChangeLogSource.table(spark, dir, "embeddings")
  private def queries = emb.filter(col("vec_id") < 20)

  test("buildIvf + ivfTopK is deterministic under the fixed seed") {
    def run(): Set[Seq[Any]] = {
      val index = Similarity.buildIvf(emb, nCentroids = 16)
      Similarity.ivfTopK(index, queries, 5, nprobe = 4)
        .collect().map(_.toSeq).toSet
    }
    assert(run() == run())
  }

  test("ivfTopK output shape: exactly k rows per query, ranks 1..k") {
    val index = Similarity.buildIvf(emb, nCentroids = 16)
    val out = Similarity.ivfTopK(index, queries, 5, nprobe = 4)
      .select(col("query_id"), col("rank"))
      .as[(Long, Long)].collect()
    assert(out.length == 100)
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size == 20)
    byQuery.values.foreach(rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 5)))
  }

  test("ivfTopK recall@5 vs brute force clears the floor") {
    val index = Similarity.buildIvf(emb, nCentroids = 16)
    val ivf = Similarity.ivfTopK(index, queries, 5, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall@5 collapsed to $recall")
  }

  test("sim_ivf_topk query carries its measured recall_ppm on every row") {
    // r6 verdict item 4: the recall audit is IN the driver-gated
    // output — one corpus-level number repeated on all 100 rows, so
    // the schema gate pins the column and a quantizer regression
    // moves a number. Same floor as the operator-level test.
    val out = graft.SparkEntry.queries("sim_ivf_topk")(spark, dir)
      .select(col("recall_ppm")).as[Long].collect()
    assert(out.length == 100)
    assert(out.toSet.size == 1, s"recall_ppm must be corpus-level")
    assert(out.head >= 400000L && out.head <= 1000000L,
      s"recall_ppm=${out.head} outside [400000, 1000000]")
  }
}
