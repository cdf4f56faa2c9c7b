package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaRow

/** The unified real-codec near-dup chain (r10 verdict item 2): real
  * PNG bytes decode through ImageIO, hash with the grid aHash, band
  * into the adaptive LSH join, and pack into the manifest — ground
  * truth exact because the fixtures are analytic cell patterns. */
class RealNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** 64×64 PNG whose 8×8 cells are black/white by `pattern` bit i
    * (cell i bright iff bit i set) — the aHash of such an image IS a
    * function of the pattern, so planted Hamming distances are exact. */
  private def cellPng(pattern: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val cell = (y / 8) * 8 + (x / 8)
      val bright = ((pattern >> cell) & 1L) == 1L
      img.setRGB(x, y, if (bright) 0xFFFFFF else 0x000000)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic ~half-weight 64-bit pattern per id (splitmix-ish;
    * no Random so the spec is replayable). */
  private def pat(id: Long): Long = {
    var z = id * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("ahashWords(grid=8) of a cell-pattern PNG recovers the pattern") {
    // a balanced pattern's bright cells exceed the grid mean exactly
    val p = 0x00000000FFFFFFFFL // low cells = TOP half bright
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cellPng(p)))
    assert(Multimodal.ahashWords(img, 8)(0) == p)
    assert(Multimodal.ahash64(img) == p) // delegation unchanged
    // grid=16: 4 words, row-major — words 0,1 cover the top half
    val w16 = Multimodal.ahashWords(img, 16)
    assert(w16.length == 4)
    assert(w16(0) == -1L && w16(1) == -1L) // top half bright
    assert(w16(2) == 0L && w16(3) == 0L) // bottom half dark
  }

  test("real chain: decode -> ahash -> banded near-dup finds planted dups only") {
    // 30 distinct random-pattern images + planted: 31 = exact dup of
    // 1; 32 = near dup of 2 (flip 2 cells -> Hamming exactly 2);
    // 33 = exact dup of 31 (a 3-cluster with 1)
    val rows = (1L to 30L).map(i => MediaRow(i, cellPng(pat(i)))) ++ Seq(
      MediaRow(31L, cellPng(pat(1L))),
      MediaRow(32L, cellPng(pat(2L) ^ 3L)), // cells 0,1 flipped
      MediaRow(33L, cellPng(pat(1L))))
    val media = spark.createDataset(rows)
    val pairs = Multimodal.ahashNearDupPairs(media, grid = 8)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 31L)) == 0L && pairs((1L, 33L)) == 0L &&
      pairs((31L, 33L)) == 0L, s"$pairs")
    assert(pairs((2L, 32L)) == 2L, s"$pairs")
    // nothing else pairs: random 64-bit patterns differ by ~32 bits
    assert(pairs.size == 4, s"unexpected pairs: $pairs")
  }

  test("real near-dups across codec and resolution: JPEG re-encode and resize pair with their originals") {
    // the property that makes aHash a NEAR-dup hash rather than a
    // checksum: re-encoding the same pixels lossily (JPEG) and
    // re-rendering the same pattern at a different resolution both
    // land within the Hamming gate of the original — byte-level dedup
    // would see three unrelated blobs
    def jpegOf(png: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    def cellPngSized(pattern: Long, size: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(size, size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val cell = size / 8
      for (y <- 0 until size; x <- 0 until size) {
        val c = (y / cell) * 8 + (x / cell)
        img.setRGB(x, y,
          if (((pattern >> c) & 1L) == 1L) 0xFFFFFF else 0x000000)
      }
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val rows = (1L to 20L).map(i => MediaRow(i, cellPng(pat(i)))) ++ Seq(
      MediaRow(21L, jpegOf(cellPng(pat(1L)))), // lossy re-encode of 1
      MediaRow(22L, cellPngSized(pat(2L), 32)), // half-resolution of 2
      MediaRow(23L, cellPngSized(pat(3L), 128))) // double-resolution of 3
    val media = spark.createDataset(rows)
    val pairs = Multimodal.ahashNearDupPairs(media, grid = 8)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 21L)) && pairs((1L, 21L)) <= 3L,
      s"JPEG re-encode must pair with its original: $pairs")
    assert(pairs.contains((2L, 22L)) && pairs((2L, 22L)) <= 3L,
      s"half-resolution must pair with its original: $pairs")
    assert(pairs.contains((3L, 23L)) && pairs((3L, 23L)) <= 3L,
      s"double-resolution must pair with its original: $pairs")
    assert(pairs.size == 3, s"only the planted variants pair: $pairs")
  }

  test("realMediaManifest: survivors + singletons, byte-exact shards") {
    val rows = (1L to 10L).map(i => MediaRow(i, cellPng(pat(i)))) ++ Seq(
      MediaRow(11L, cellPng(pat(1L))), // dup cluster {1, 11}
      MediaRow(12L, cellPng(pat(2L)))) // dup cluster {2, 12}
    val media = spark.createDataset(rows)
    val got = Multimodal.realMediaManifest(media, budgetBytes = 400L)
      .as[(Long, Long, Long)].collect().toSeq
    // survivors: min id per cluster (1, 2) + the 8 singletons = 10
    assert(got.map(_._1) == (1L to 10L), s"$got")
    // n_bytes is the real payload length; shards are an exclusive
    // byte prefix sum over id order
    val sizes = rows.map(r => r.id -> r.payload.length.toLong).toMap
    assert(got.forall { case (id, nb, _) => nb == sizes(id) })
    var pb = 0L
    for ((id, nb, shard) <- got) {
      assert(shard == pb / 400L, s"id=$id pb=$pb shard=$shard")
      pb += nb
    }
  }

  test("grid=16 lifts the adaptive band-width cap past the 64-bit budget") {
    // one word (grid=8, 4 bands): cap 16 bits/band -> occupancy grows
    // past n = 64 * 2^16 ~ 4.2M; four words (grid=16): cap 64 -> the
    // formula keeps tracking out past 10^12 docs
    assert(Multimodal.adaptiveBandBits(10000000L, nWords = 1) == 16)
    val occCapped = 10000000.0 / (1L << 16)
    assert(occCapped > 64.0)
    for (n <- Seq(10000000L, 1000000000L, 1000000000000L)) {
      val bb = Multimodal.adaptiveBandBits(n, nWords = 4)
      val occ = n.toDouble / math.pow(2.0, bb)
      assert(occ <= 64.0 && occ > 16.0, s"n=$n bb=$bb occ=$occ")
    }
    // at 2^62 docs the occupancy need is 56 bits — still under the
    // 4-word cap (the Long range runs out before the width does),
    // while one word pins at its 16-bit layout cap
    assert(Multimodal.adaptiveBandBits(Long.MaxValue / 2, nWords = 4) == 56)
    assert(Multimodal.adaptiveBandBits(Long.MaxValue / 2, nWords = 1) == 16)
  }

  test("video sidecar contract: extracted frame rows drive decode + scene cuts") {
    // mp4/webm arrive as pre-extracted (video_id, frame_ix, payload)
    // rows (r10 "What's missing" #1). Two videos, frames as real PNGs:
    // video 7 flips its cell pattern at frame 4 (one cut), video 8 is
    // static (no cuts). Patterns are half-weight so the aHash recovers
    // them exactly (see cellPng).
    val a = 0x00000000FFFFFFFFL
    val b = 0xFFFFFFFF00000000L
    val rows = (0 until 8).map { f =>
      Multimodal.SidecarFrameRow(7L, f, cellPng(if (f < 4) a else b))
    } ++ (0 until 6).map { f =>
      Multimodal.SidecarFrameRow(8L, f, cellPng(a))
    }
    val frames = spark.createDataset(rows)
    val decoded = Multimodal.decodeSidecarFrames(frames, batchSize = 3)
      .collect().toSeq
    assert(decoded.size == 14)
    assert(decoded.filter(_.id == 7L).sortBy(_.frameIx)
      .map(_.ahash) == Seq(a, a, a, a, b, b, b, b))
    val cuts = Multimodal.sceneCutsFromSidecar(frames, maxDist = 8)
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    // video 7: 7 comparisons, the flip at frame 4 is Hamming 64
    assert(cuts.filter(_._1 == 7L).map(c => (c._2, c._3, c._4)) ==
      Seq((1, 0L, false), (2, 0L, false), (3, 0L, false),
        (4, 64L, true), (5, 0L, false), (6, 0L, false), (7, 0L, false)),
      s"$cuts")
    // video 8: static — every comparison Hamming 0, no cuts
    assert(cuts.filter(_._1 == 8L).forall(c => c._3 == 0L && !c._4))
    // and the frame hashes feed the SAME near-dup machinery: the four
    // a-pattern frames of video 8 pair with each other at distance 0
    val hashed = Multimodal.decodeSidecarFrames(frames).toDF()
      .selectExpr("id * 100 + frameIx AS fid", "array(ahash) AS phs")
    val pairs = Multimodal.hashNearDupPairs(hashed, "fid", "phs",
        nWords = 1, bandBits = 16, maxDist = 0)
      .count()
    // frames with pattern a: video7 f0..3 + video8 f0..5 = 10 -> C(10,2)
    // pattern b: video7 f4..7 = 4 -> C(4,2)
    assert(pairs == 45 + 6, s"pairs=$pairs")
  }

  test("decodeImagesQuarantine: bad payloads flag, good ones decode, batches survive") {
    // a corrupt blob mid-batch must cost ONE quarantine row — the
    // rest of its batch still decodes (failed batches re-decode
    // payload-by-payload; clean batches stay one vectorized call)
    val good = cellPng(pat(9L))
    val rows = Seq(
      MediaRow(1L, good),
      MediaRow(2L, Array[Byte](1, 2, 3)), // garbage
      MediaRow(3L, good),
      MediaRow(4L, Array.empty[Byte]), // empty
      MediaRow(5L, good))
    val got = Multimodal.decodeImagesQuarantine(
        spark.createDataset(rows).coalesce(1), batchSize = 5)
      .collect().map(r => r.id -> r).toMap
    assert(got.size == 5)
    for (i <- Seq(1L, 3L, 5L)) {
      val r = got(i)
      assert(r.ok && r.width == 64 && r.height == 64 && r.error == null,
        s"$r")
    }
    for (i <- Seq(2L, 4L)) {
      val r = got(i)
      assert(!r.ok && r.error != null && r.error.nonEmpty, s"$r")
      assert(r.width == 0 && r.sumR == 0L, s"$r")
    }
    // an all-good frame decodes identically to the strict path
    val clean = spark.createDataset(Seq(MediaRow(7L, good)))
    val strict = Multimodal.decodeImagesBatched(clean).collect().head
    val quar = Multimodal.decodeImagesQuarantine(clean).collect().head
    assert(quar.ok && (quar.sumR, quar.sumG, quar.sumB) ==
      ((strict.sumR, strict.sumG, strict.sumB)))
  }

  test("hashNearDupPairs handles full-64-bit words (sign bit is data)") {
    // patterns with the top bit set exercise the logical-shift path:
    // arithmetic shift would smear the sign across the band value
    val a = 0xF000000000000001L // near-identical pair
    val b = 0xF000000000000003L
    val df = Seq((1L, Seq(a)), (2L, Seq(b)), (3L, Seq(0x0FF00FF00FF00FF0L)))
      .toDF("id", "phs")
    val got = Multimodal.hashNearDupPairs(df, "id", "phs",
        nWords = 1, bandBits = 16)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L)), s"$got")
  }
}
