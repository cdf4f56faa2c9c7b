package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** BigInt reference of one damped integer power iteration. */
  private def refIter(ranks: Map[String, BigInt],
                      edges: Seq[(String, String, Long)],
                      base: Long): Map[String, BigInt] = {
    val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
      ranks(s) * w / wout(s)
    }.sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    nodes.map(n =>
      n -> (BigInt(base) + BigInt(17) * in.getOrElse(n, BigInt(0)) / 20)).toMap
  }

  test("pageRankInt matches a BigInt reference over 3 iterations") {
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 5L), ("d", "a", 1L)) // d: no inbound -> base rank
    val got = Graph.pageRankInt(edges.toDF("src", "dst", "w"), iters = 3)
      .as[(String, Long)].collect().toMap
    val base = 1000000000L * 3 / 20
    var ref = (edges.map(_._1) ++ edges.map(_._2)).distinct
      .map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to 3) ref = refIter(ref, edges, base)
    assert(got == ref.map { case (k, v) => k -> v.toLong })
    // d keeps exactly the teleport base (nothing points at it)
    assert(got("d") == base)
  }

  test("personalizedPageRankInt matches a seed-based BigInt reference") {
    val edges = Seq(
      ("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L), ("a", "c", 1L),
      ("d", "e", 5L)) // d,e: disconnected from the seed component
    val got = Graph.personalizedPageRankInt(
        edges.toDF("src", "dst", "w"), seed = "a", iters = 3)
      .as[(String, Long)].collect().toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val baseMass = BigInt(1000000000L * 3 / 20)
    def refIterSeed(r: Map[String, BigInt]): Map[String, BigInt] = {
      val wout = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _, w) =>
        r(u) * w / wout(u)
      }.sum).toMap
      nodes.map(n => n -> ((if (n == "a") baseMass else BigInt(0)) +
        BigInt(17) * in.getOrElse(n, BigInt(0)) / 20)).toMap
    }
    var ref = nodes.map(n =>
      n -> (if (n == "a") BigInt(1000000000L) else BigInt(0))).toMap
    for (_ <- 1 to 3) ref = refIterSeed(ref)
    assert(got == ref.map { case (k, v) => k -> v.toLong })
    // mass never reaches the component the seed cannot see
    assert(got("d") == 0L && got("e") == 0L)
    assert(got("a") > got("b") && got("b") > 0L)
  }

  test("pageRankInt: rank mass flows toward the sink-heavy node") {
    // star into z: z must outrank every leaf
    val edges = Seq(("a", "z", 1L), ("b", "z", 1L), ("c", "z", 1L),
      ("z", "a", 1L))
    val got = Graph.pageRankInt(edges.toDF("src", "dst", "w"), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got("z") > got("a") && got("a") > got("b"))
    assert(got("b") == got("c")) // symmetric leaves tie exactly
  }

  test("pageRankInt rejects bad damping and iteration counts") {
    val e = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException](Graph.pageRankInt(e, iters = 0))
    intercept[IllegalArgumentException](
      Graph.pageRankInt(e, dampNum = 20L, dampDen = 20L))
  }

  test("bfsHops: chain distances, cycle closure, unreachable excluded") {
    // a -> b -> c -> d with a back edge d -> a, plus a disconnected
    // pair x -> y; from 'a': exact chain distances, cycle adds
    // nothing shorter, x/y never appear
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("x", "y")).toDF("src", "dst")
    val got = Graph.bfsHops(edges, "a", maxHops = 8)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    // a shorter alternative path must win over a longer first find
    val multi = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("src", "dst")
    assert(Graph.bfsHops(multi, "a").as[(String, Long)].collect()
      .toMap.apply("d") == 1L)
  }

  test("triangleStats: clique, star hub, noise edges") {
    // K4 on 1-4 (each node: degree 3, in 3 triangles), star hub 10
    // with leaves 11-13 (no triangles — the orientation must not
    // square the hub), a duplicated + reversed edge, a self loop,
    // and an isolated edge 20-21
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (2L, 1L), (1L, 2L),       // dup + reversal collapse to one edge
      (7L, 7L),                 // self loop dropped
      (20L, 21L))
      .toDF("src", "dst")
    val got = Graph.triangleStats(edges)
      .orderBy($"node").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L), (4L, 3L, 3L),
      (10L, 3L, 0L), (11L, 1L, 0L), (12L, 1L, 0L), (13L, 1L, 0L),
      (20L, 1L, 0L), (21L, 1L, 0L)))
    // total triangles = per-node sum / 3 = 4 (all in the clique)
    assert(got.map(_._3).sum == 12L)
  }

  test("degreeProfile: octave histogram; dups, reversals, self-loops collapse") {
    // star 0-(1..5): center degree 5 (octave 2), leaves degree 1
    // (octave 0); reversed/duplicate edges and the self-loop must not
    // change any degree
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 0L), (0L, 2L), (3L, 3L))
      .toDF("src", "dst")
    val got = Graph.degreeProfile(edges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 5L, 5L), (2L, 1L, 5L)))
  }

  test("kCore: cascade peel — chain into clique peels hop by hop") {
    // 4-clique {1,2,3,4} with a pendant chain 4-5-6-7: for k=2 the
    // chain peels from the FAR end one round at a time (7, then 6,
    // then 5 — each drop lowers its neighbor below k), the clique
    // survives with in-core degree 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2)
      .as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k above the max clique degree empties the graph
    assert(Graph.kCore(edges, k = 4).count() == 0L)
    // duplicate/reversed edges and self-loops must not alter degrees
    val messy = edges.unionAll(Seq((2L, 1L), (3L, 3L), (1L, 2L))
      .toDF("src", "dst"))
    assert(Graph.kCore(messy, k = 2).as[(Long, Long)].collect().toSeq
      == core)
  }

  test("kCore refuses loudly when maxRounds is too small to converge") {
    // a 10-chain needs ~4 peel rounds at k=2; cap at 1 must throw,
    // not silently emit a half-peeled graph the oracle can't match
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[Exception] {
      Graph.kCore(chain, k = 2, maxRounds = 1).count()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }

  test("linkPrediction: shared neighbors of non-adjacent pairs, hub-capped") {
    // path 1-2-3 plus 1-4-3: pairs (1,3) share {2,4}; (2,4) share
    // {1,3}; adjacent pairs never appear
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val got = Graph.linkPrediction(edges)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 2L, 2L), (2L, 4L, 2L, 2L, 2L)))
    // hub cap: a star's center exceeding maxDeg contributes no wedges
    // — its leaves stop being "suggested links" through it
    val star = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    assert(Graph.linkPrediction(star, maxDeg = 4).count() == 0L)
    assert(Graph.linkPrediction(star, maxDeg = 5).count() == 10L)
  }

  test("topKNeighbors: strongest k per node, union semantics, ties by id") {
    // node 0 has partners 1..4 with weights 40,30,20,10; k=2 keeps
    // {1,2} from 0's view — but 3 and 4 (degree 1) each keep their
    // only partner 0, so union retains ALL edges at 0 except none
    // dropped... use leaf-vs-leaf edges to see real drops:
    val e = Seq(
      (0L, 1L, 40L), (0L, 2L, 30L), (0L, 3L, 20L), (0L, 4L, 10L),
      // 3-4 weak edge: both 3 and 4 prefer 0 (20,10 > 5 resp.) and
      // have k=1... with k=2 both still keep it; with k=1 it drops
      (3L, 4L, 5L))
      .toDF("src", "dst", "shared")
    val k2 = Graph.topKNeighbors(e, k = 2)
      .orderBy($"src", $"dst").as[(Long, Long)].collect().toSeq
    // union kNN: 0 selects {1,2}; 1 selects {0}; 2 selects {0};
    // 3 selects {0,4}; 4 selects {0,3} -> all 5 edges survive
    assert(k2 == Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (3L, 4L)))
    val k1 = Graph.topKNeighbors(e, k = 1)
      .orderBy($"src", $"dst").as[(Long, Long)].collect().toSeq
    // k=1: 0 keeps only 1 (strongest); 2,3,4 each keep 0 -> edge
    // (3,4) drops (neither endpoint's top-1), (0,2),(0,3),(0,4)
    // survive via the leaf side
    assert(k1 == Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    // deterministic tie-break: equal weights resolve to the lower id
    val tie = Seq((9L, 5L, 7L), (9L, 3L, 7L)).toDF("src", "dst", "shared")
    val t1 = Graph.topKNeighbors(tie, k = 1)
      .orderBy($"src", $"dst").as[(Long, Long)].collect().toSeq
    // 9's top-1 under (7,3) vs (7,5) is 3; 3 and 5 keep 9 anyway ->
    // both edges survive through the leaf side
    assert(t1 == Seq((3L, 9L), (5L, 9L)))
  }

  test("cooccurrenceEdges: pair counts, minShared floor, hot-group cap") {
    val rel = Seq(
      // group g1: items 1,2,3 -> pairs (1,2),(1,3),(2,3)
      ("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 3L), // dup row collapses
      // group g2: items 1,2 -> pair (1,2) again => shared=2
      ("g2", 1L), ("g2", 2L),
      // group g3: over the cap (4 items > maxGroupSize=3) -> excluded
      ("g3", 1L), ("g3", 2L), ("g3", 8L), ("g3", 9L))
      .toDF("g", "item")
    val got = Graph.cooccurrenceEdges(rel, $"g", $"item",
        minShared = 1L, maxGroupSize = 3L)
      .orderBy($"src", $"dst")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val floored = Graph.cooccurrenceEdges(rel, $"g", $"item",
        minShared = 2L, maxGroupSize = 3L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(floored == Seq((1L, 2L, 2L)))
  }
}
