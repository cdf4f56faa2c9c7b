package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutAndTrendSpec extends SparkSpec {
  import spark.implicits._

  // ---- Morton / Z-order layout ----

  /** Reference Morton interleave (bit-at-a-time, the spec the
    * shift-mask expansion must match). */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("mortonKey matches the bit-at-a-time reference") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L)).toDF("x", "y")
    val got = pts.select(col("x"), col("y"),
        Layout.mortonKey(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"morton($x, $y)")
    }
  }

  test("zorderLayout: files tile a full grid into bounded squares") {
    // full 64x64 grid, bits=6, fileBits=4 -> 16 files of 256 codes;
    // on the Z-curve each file is EXACTLY a 16x16 square
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val rep = Layout.zorderLayout(grid, col("x"), col("y"),
        bits = 6, fileBits = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rep.length == 16)
    rep.foreach { case (_, n, minX, maxX, minY, maxY, area) =>
      assert(n == 256L)
      assert(maxX - minX + 1 == 16L && maxY - minY + 1 == 16L)
      assert(area == 256L)
    }
    // versus a row-major (1-D sort) split into 16 files: each file is
    // 4 full rows -> rectangle 64 wide, area 256 vs 64*4=256 rows but
    // x-range 64: a predicate on x prunes NOTHING. The z-layout's
    // 16-wide rectangles prune 3/4 of files for a 16-wide x range.
    val filesTouchedByXRange = rep.count { case (_, _, minX, maxX, _, _, _) =>
      maxX >= 0L && minX <= 15L // query rectangle x in [0, 15]
    }
    assert(filesTouchedByXRange == 4, s"z-layout touched $filesTouchedByXRange")
  }

  // ---- zone maps ----

  test("zoneMap: clustered dim skips, scattered dim never skips") {
    // 4 groups of 10; d1 = row id (clustered by construction),
    // d2 = id % 4 (every group covers the full domain)
    val rows = (0L until 40L).map(i => (i, i, i % 4)).toDF("rid", "a", "b")
    val zm = Layout.zoneMap(rows, expr("rid div 10"),
        col("a"), 10L, 19L, // exactly group 1
        col("b"), 1L, 2L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect()
    assert(zm.length == 4)
    zm.foreach { case (rg, n, minA, maxA, minB, maxB, skipA, skipB) =>
      assert(n == 10L)
      assert(minA == rg * 10 && maxA == rg * 10 + 9, "tight zones on a")
      assert(minB == 0L && maxB == 3L, "full-domain zones on b")
      assert(skipA == (rg != 1L), s"rg=$rg must skip iff not group 1")
      assert(!skipB, "a full-domain zone can never skip")
    }
  }

  test("zoneMap skip flag is exactly the parquet stats predicate") {
    // boundary cases: zone touching lo, touching hi, fully below, above
    val rows = Seq((0L, 5L), (1L, 10L), (2L, 20L), (3L, 21L))
      .toDF("g", "x")
    val got = Layout.zoneMap(rows, col("g"), col("x"), 10L, 20L,
        col("x"), 10L, 20L)
      .select(col("rg"), col("skip_d1")).as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> false, 3L -> true))
  }

  // ---- compaction planning ----

  test("compactionPlan: exact ceil packing, big files never counted") {
    val manifest = Seq(
      // p1: three small files (100+100+50=250 -> 1 target file), one big
      ("p1", 1L, 100L), ("p1", 2L, 100L), ("p1", 3L, 50L), ("p1", 4L, 5000L),
      // p2: only big files -> nothing to do
      ("p2", 5L, 4000L), ("p2", 6L, 9999L),
      // p3: small bytes exactly at a bin boundary (1024) -> 1 bin
      ("p3", 7L, 512L), ("p3", 8L, 512L),
      // p4: crosses the boundary (1025) -> 2 bins
      ("p4", 9L, 513L), ("p4", 10L, 512L))
      .toDF("part", "file_id", "bytes")
    val plan = Layout.compactionPlan(manifest,
        smallBytes = 1024L, targetBytes = 1024L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(plan("p1") == (("p1", 4L, 5250L, 3L, 250L, 1L, 2L)))
    assert(plan("p2") == (("p2", 2L, 13999L, 0L, 0L, 0L, 0L)))
    assert(plan("p3") == (("p3", 2L, 1024L, 2L, 1024L, 1L, 1L)))
    assert(plan("p4") == (("p4", 2L, 1025L, 2L, 1025L, 2L, 0L)))
  }

  // ---- OLS trend slope ----

  test("trendSlope: exact slopes, sign-split division, den=0 dropped") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: q = 2x (slope exactly 2/min -> 2e6 ppm); lattice q = 2x
    // means value = 2x / 2^20
    val rows =
      (0L to 9L).map(x => (1L, ts(x), (2.0 * x) / 1048576.0)) ++
      (0L to 9L).map(x => (2L, ts(x), 5.0 / 1048576.0)) ++        // flat
      (0L to 9L).map(x => (3L, ts(x), (-3.0 * x) / 1048576.0)) ++ // down
      Seq((4L, ts(7L), 1.0), (4L, ts(7L), 2.0))                   // den=0
    val df = rows.toDF("user_id", "ts", "value")
    val got = TimeSeries.trendSlope(df)
      .select(col("user_id"), col("slope_ppm_per_min"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 2000000L)
    assert(got(2L) == 0L)
    assert(got(3L) == -3000000L)
    assert(!got.contains(4L), "den=0 series must be dropped")
  }

  test("trendSlope: num/den are the exact cleared-fraction pair") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // y values 1,2,4 at x=0,1,2: Σxy=10, Σx=3, Σy=7, Σx²=5 ->
    // num = 3·10−21 = 9, den = 3·5−9 = 6, ppm = 9e6 div 6 = 1500000
    val df = Seq((9L, ts(0L), 1.0 / 1048576.0), (9L, ts(1L), 2.0 / 1048576.0),
      (9L, ts(2L), 4.0 / 1048576.0)).toDF("user_id", "ts", "value")
    val r = TimeSeries.trendSlope(df)
      .select(col("num").cast("long"), col("den").cast("long"),
        col("slope_ppm_per_min"))
      .as[(Long, Long, Long)].head()
    assert(r == ((9L, 6L, 1500000L)))
  }
}
