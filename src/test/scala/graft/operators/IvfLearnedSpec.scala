package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The learned-KMeans IVF path's pinnable properties — everything about
 * `sim_ivf_topk` that ISN'T the learned model itself (which the driver
 * oracle gates on rows+schema only, by design):
 * determinism under the fixed seed, exact output shape, and TWO recall
 * floors against brute-force ground truth: 0.4 on the near-uniform
 * synthetic corpus (measured 0.51 at sf0.001 / 0.69 at sf0.01 with
 * nprobe=4 of 16 — the adversarial case, where IVF recall is expected
 * to be poor and the floor pins "still genuinely ranking"), and 0.9 on
 * a planted-cluster corpus (the regime IVF exists for, where the
 * learned quantizer must recover the cluster structure — r7 verdict
 * item 3, so the driver artifact's recall_ppm reads without a
 * footnote).
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

  test("ivfTopK recall@5 on a planted-cluster corpus clears 0.9") {
    // r7 verdict item 3: the near-uniform floor above (0.4) mostly
    // pins "no worse than before" — on data with real cluster
    // structure (the regime IVF exists for) the learned quantizer
    // must EARN its keep. 16 planted angular clusters, 100 vectors
    // each (center ± 5% noise): a query's true top-5 are its
    // cluster-mates, so recall@5 collapses unless KMeans recovers the
    // planted partition and the probe ranking finds the right bucket.
    val rnd = new scala.util.Random(42)
    val centers = Seq.fill(16)(Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0L until 1600L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 20)
    val index = Similarity.buildIvf(emb, nCentroids = 16)
    val ivf = Similarity.ivfTopK(index, q, 5, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"planted-cluster recall@5 = $recall < 0.9")
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

  test("sim_ivf_topk schema is pinned (the rows-only gate's type leg)") {
    // r12 verdict item 8: the query is now OFFICIALLY rows-only in the
    // driver gate (the learned quantizer can't be hash-replayed by any
    // SQL oracle), which also drops it from typecheck.py's DESCRIBE
    // parity — so the declared schema is pinned HERE instead. The
    // hash-gated deterministic twin (sim_ivf_det_topk) carries the
    // value-level verification of the probe-pruning shape.
    val out = graft.SparkEntry.queries("sim_ivf_topk")(spark, dir)
    assert(out.schema.map(f => (f.name, f.dataType.sql)) == Seq(
      ("query_id", "BIGINT"), ("rank", "BIGINT"), ("neighbor_id", "BIGINT"),
      ("sim", "DOUBLE"), ("recall_ppm", "BIGINT")),
      s"sim_ivf_topk schema drifted: ${out.schema.treeString}")
  }
}
