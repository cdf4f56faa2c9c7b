package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Property tests pinning the h60 tight-loop expressions to their
 * builtin-composition equivalents on random inputs — the same
 * compositions the DuckDB oracles use, so agreement here is agreement
 * with the oracle on inputs far beyond the fixed test corpus.
 * (Hand-rolled seeded loops; the scalatestplus-scalacheck bridge is
 * not available offline.)
 */
class H60PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  private def randomString(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    // printable ASCII plus some multi-byte chars for the UTF-8 paths
    val chars = "abcdefghijklmnop qrstuvwxyz0123456789!@# é¢ω"
    (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  test("h60 column == plain-Scala H60.hash on 200 random strings") {
    val strs = (1 to 200).map(_ => randomString(50)).distinct
    val viaCol = strs.toDF("s")
      .select($"s", graft.functions.functions.h60($"s"))
      .as[(String, Long)].collect().toMap
    strs.foreach(s => assert(viaCol(s) == H60.hash(s), s"h60('$s')"))
  }

  test("minhash60 == md5/conv builtin composition on 50 random shingle sets") {
    val perms = 8
    val pa = (0 until perms).map(H60.permA)
    val pb = (0 until perms).map(H60.permB)
    val sets = (1 to 50).map(_ =>
      (1 to rnd.nextInt(12) + 1).map(_ => randomString(20)))
    val df = sets.toDF("sh")
    val composed = transform(sequence(lit(0), lit(perms - 1)), j =>
      array_min(transform($"sh", e =>
        (element_at(lit(pa.toArray), j + 1) *
          (graft.functions.functions.h60(e) % 2147483647L) +
          element_at(lit(pb.toArray), j + 1)) % 2147483647L)))
    val rows = df.select(
      graft.functions.functions.minhash60($"sh", perms), composed)
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("rolling_poly_fp == direct per-window recompute on 100 random ASCII strings") {
    def reference(s: String, k: Int, mod: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8")
      def h(lo: Int, hi: Int): Long = {
        var acc = 0L
        (lo until hi).foreach(i => acc = (acc * H60.B + (bytes(i) & 0xffL)) % H60.P)
        acc
      }
      val all = if (bytes.length <= k) Seq(h(0, bytes.length))
                else (0 to bytes.length - k).map(i => h(i, i + k))
      all.filter(_ % mod == 0).distinct.sorted
    }
    val strs = (1 to 100).map(_ => randomString(80).filter(_ < 128))
    val viaExpr = strs.toDF("s")
      .select($"s", graft.functions.functions.rolling_poly_fp($"s", 8, 4))
      .as[(String, Seq[Long])].collect().toMap
    strs.foreach(s => assert(viaExpr(s) == reference(s, 8, 4), s"rfp('$s')"))
  }

  test("simhash60 bit-votes match a reference recompute on 50 random token sets") {
    def reference(toks: Seq[String]): Long = {
      val votes = new Array[Int](60)
      toks.foreach { t =>
        val h = H60.hash(t)
        (0 until 60).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 60).foldLeft(0L)((fp, b) =>
        if (votes(b) > 0) fp | (1L << b) else fp)
    }
    val sets = (1 to 50).map(_ =>
      (0 to rnd.nextInt(15)).map(_ => randomString(12)))
    val got = sets.toDF("toks")
      .select(graft.functions.functions.simhash60($"toks"))
      .as[Long].collect()
    sets.zip(got).foreach { case (toks, fp) =>
      assert(fp == reference(toks))
    }
  }

  test("word_shingles == transform/slice/concat_ws composition, k in 1..9") {
    // normalized-shaped inputs: the expression's contract is
    // single-space-separated trimmed text (shingleSets normalizes first)
    def randomNormalized(): String =
      (0 until rnd.nextInt(20))
        .map(_ => randomString(8).replace(" ", ""))
        .filter(_.nonEmpty).mkString(" ")
    val inputs = (1 to 60).map(_ => (randomNormalized(), rnd.nextInt(9) + 1))
    inputs.foreach { case (s, k) =>
      val df = Seq(s).toDF("t")
      val composed = df
        .select(split($"t", " ").as("toks"))
        .select(array_distinct(
          when(size($"toks") >= k,
            transform(sequence(lit(0), size($"toks") - lit(k)),
              i => concat_ws(" ", slice($"toks", i + lit(1), lit(k)))))
            .otherwise(array(concat_ws(" ", $"toks")))).as("sh"))
        .as[Seq[String]].head()
      val fast = df.select(
          graft.functions.functions.word_shingles($"t", k))
        .as[Seq[String]].head()
      assert(fast == composed, s"k=$k input='$s'")
    }
  }

  test("sorted_intersect_size == size(array_intersect) on 200 random sorted sets") {
    val pairs = (1 to 200).map { _ =>
      // overlapping alphabets so intersections are non-trivial; sets
      // (distinct) and sorted — the caller contract
      def set(): Seq[String] =
        (0 to rnd.nextInt(20)).map(_ => randomString(6)).distinct.sorted
      (set(), set())
    }
    val rows = pairs.toDF("a", "b").select(
        graft.functions.functions.sorted_intersect_size($"a", $"b"),
        size(array_intersect($"a", $"b")).cast("long"))
      .as[(Long, Long)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
    // empty-vs-empty and identical-set edges
    val edges = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x"), Seq.empty[String]),
      (Seq("a", "b", "é"), Seq("a", "b", "é"))).toDF("a", "b")
    val got = edges.select(
        graft.functions.functions.sorted_intersect_size($"a", $"b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 3L))
  }

  test("count_in_set / array_total_strlen == filter/aggregate compositions") {
    val stop = Seq("the", "a", "of", "ω")
    val sets = (1 to 60).map(_ =>
      (0 to rnd.nextInt(12)).map(_ =>
        if (rnd.nextBoolean()) stop(rnd.nextInt(stop.size))
        else randomString(6)))
    val df = sets.toDF("toks")
    val rows = df.select(
        graft.functions.functions.count_in_set($"toks", stop),
        size(filter($"toks", t => t.isin(stop: _*))),
        graft.functions.functions.array_total_strlen($"toks"),
        aggregate($"toks", lit(0L), (acc, t) => acc + length(t).cast("long")))
      .as[(Int, Int, Long, Long)].collect()
    rows.foreach { case (fastCnt, refCnt, fastLen, refLen) =>
      assert(fastCnt == refCnt && fastLen == refLen)
    }
  }
}
