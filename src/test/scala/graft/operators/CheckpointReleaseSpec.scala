package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Checkpoints

/**
 * Storage discipline of the iterative operators (r6 verdict item 6):
 * each peel/propagation/contraction round `localCheckpoint`s its
 * frame, and the superseded round's blocks must be RELEASED — live
 * executor storage is the current round plus the one being built
 * (≤ 2 loop frames), never O(rounds). Asserted directly against
 * `sc.getPersistentRDDs`, the registry `localCheckpoint` stores into.
 */
class CheckpointReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Run `op`, force its result, and return how many RDDs persisted
    * during the run are STILL persisted afterwards. */
  private def survivors(op: => org.apache.spark.sql.DataFrame): Int = {
    val before = persistedIds
    val out = op
    out.collect()
    (persistedIds -- before).size
  }

  test("Checkpoints.release drops a checkpointed frame's RDD; no-op otherwise") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    Checkpoints.release(df) // not checkpoint-backed: must not throw
    assert(Checkpoints.rddId(df).isEmpty)
    val ck = df.localCheckpoint(true)
    val id = Checkpoints.rddId(ck)
    assert(id.nonEmpty)
    assert(persistedIds.contains(id.get))
    Checkpoints.release(ck)
    assert(!persistedIds.contains(id.get))
  }

  test("Checkpoints.release reaches a checkpoint wrapped by projection/filter") {
    // ADVICE r7: a refactor that passes a select/filter over the
    // checkpointed frame must still release the underlying blocks —
    // release() collects LogicalRDD leaves, not just a bare root
    val ck = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
      .localCheckpoint(true)
    val wrapped = ck.filter(col("a") > 1L).select(col("b"))
    val ids = Checkpoints.rddIds(wrapped)
    assert(ids.nonEmpty && ids.forall(persistedIds.contains))
    Checkpoints.release(wrapped)
    assert(ids.forall(i => !persistedIds.contains(i)))
  }

  test("kCore retains at most the final checkpoint after a deep peel") {
    // chain into clique: each chain hop peels in its own round, so
    // this run takes ~6 rounds — without per-round release it would
    // leave ~7 persisted edge lists behind
    val chain = (0L until 5L).map(i => (i, i + 1))
    val clique = Seq((5L, 6L), (5L, 7L), (6L, 7L))
    val edges = (chain ++ clique).toDF("src", "dst")
    assert(survivors(Graph.kCore(edges, k = 2)) <= 2)
  }

  test("nearDupComponents retains at most the final labels after a long chain") {
    // a 12-doc chain needs ~diameter rounds of label propagation
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assert(survivors(Dedup.nearDupComponents(pairs, maxRounds = 32)) <= 2)
  }

  test("starContractComponents retains at most the final edges") {
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assert(survivors(Dedup.starContractComponents(pairs)) <= 2)
  }
}
