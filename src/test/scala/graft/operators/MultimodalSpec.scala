package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.{DecodedRow, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageIoCodec decodes real PNG/JPEG fixture bytes through the batch shape") {
    // r8 verdict item 5: the one mapPartitions site runs REAL bytes.
    // fixture_4x2.png is hand-crafted (pixel sums analytic: R=621,
    // G=682, B=743); fixture_8x6.jpg was written once by ImageIO and
    // its decoded sums pinned at generation time.
    def fixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val png = fixture("fixture_4x2.png")
    val jpg = fixture("fixture_8x6.jpg")
    val media = spark.createDataset(Seq(
      MediaRow(1L, png), MediaRow(2L, jpg), MediaRow(3L, png),
      MediaRow(4L, jpg), MediaRow(5L, png))).coalesce(1)
    val got = Multimodal.decodeImagesBatched(media, batchSize = 2)
      .collect().toSeq
    val byId = got.map(r => r.id -> r).toMap
    for (i <- Seq(1L, 3L, 5L)) {
      val r = byId(i)
      assert((r.width, r.height, r.channels) == ((4, 2, 3)), s"png dims: $r")
      assert((r.sumR, r.sumG, r.sumB) == ((621L, 682L, 743L)),
        s"png pixel sums must match the analytic fixture: $r")
    }
    for (i <- Seq(2L, 4L)) {
      val r = byId(i)
      assert((r.width, r.height, r.channels) == ((8, 6, 3)), s"jpg dims: $r")
      // JPEG decode is JRE-vendor/version dependent (IDCT rounding);
      // the analytic-exact gate lives on the PNG fixture. Here the sums
      // are pinned within a small tolerance so a JRE upgrade doesn't
      // legitimately break the suite (advisory r9). 8x6x255 max sum is
      // 12240; ±48 is ±1 LSB per pixel.
      val pinned = Seq(("R", r.sumR, 5782L), ("G", r.sumG, 5743L),
        ("B", r.sumB, 5658L))
      for ((ch, got, want) <- pinned)
        assert(math.abs(got - want) <= 48L,
          s"jpg $ch sum $got drifted more than 1 LSB/pixel from $want: $r")
    }
    // the batch shape is the vectorized-codec contract: 5 rows in one
    // partition at batchSize=2 -> batches of 2, 2, 1
    assert(got.groupBy(_.batchId).view.mapValues(_.size).toMap ==
      Map(0 -> 2, 1 -> 2, 2 -> 1))
    assert(got.forall(r => r.batchSize == (if (r.batchId == 2) 1 else 2)))
    // undecodable payloads fail loudly, not silently
    val bad = spark.createDataset(Seq(MediaRow(9L, Array[Byte](1, 2, 3))))
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImagesBatched(bad).collect()
    }
    assert(err.getMessage != null)
  }

  private lazy val docs = Seq(
    (1L, "a small payload"), (2L, "another payload"), (3L, "третий"))
    .toDF("doc_id", "text")

  test("asMedia: typed metadata, byte-accurate lengths (incl. UTF-8)") {
    val m = Multimodal.asMedia(docs, "doc_id", $"text".cast("binary"), "image")
    val meta = m.select($"doc_id", $"meta.media_type", $"meta.n_bytes")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(meta(1L)._2 == "image")
    assert(meta(1L)._3 == 15L)
    assert(meta(3L)._3 == 12L) // 6 cyrillic chars = 12 UTF-8 bytes
  }

  test("decode stub is deterministic and in-range") {
    val m = Multimodal.asMedia(docs, "doc_id", $"text".cast("binary"), "image")
    val d1 = m.select(Multimodal.decodeImageStub($"payload").as("i"))
      .select("i.width", "i.height", "i.channels")
      .as[(Int, Int, Int)].collect()
    val d2 = m.select(Multimodal.decodeImageStub($"payload").as("i"))
      .select("i.width", "i.height", "i.channels")
      .as[(Int, Int, Int)].collect()
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall { case (w, h, c) =>
      w >= 32 && w < 1952 && h >= 32 && h < 1112 && c == 3 })
  }

  test("feature stub yields dims floats in [-1, 1]") {
    val m = Multimodal.asMedia(docs, "doc_id", $"text".cast("binary"), "image")
    val f = m.select(Multimodal.extractFeaturesStub($"payload", 8))
      .as[Seq[Float]].collect()
    assert(f.forall(_.size == 8))
    assert(f.flatten.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("batched decode processes partitions in fixed-size batches") {
    val media = (1L to 150L)
      .map(i => MediaRow(i, s"payload-$i".getBytes("UTF-8")))
      .toDS().repartition(2)
    val decoded: Seq[DecodedRow] =
      Multimodal.decodeBatched(media, batchSize = 32).collect().toSeq
    assert(decoded.size == 150)
    assert(decoded.map(_.id).distinct.size == 150)
    assert(decoded.forall(_.batchSize <= 32))
    // at least one full batch per partition (75 rows -> batches of 32)
    assert(decoded.count(_.batchSize == 32) >= 64)
    // stub decode must agree with the expression-form stub
    val exprDims = Multimodal
      .asMedia(media.toDF(), "id", $"payload", "image")
      .select($"id", Multimodal.decodeImageStub($"payload").as("i"))
      .select($"id", $"i.width", $"i.height").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    decoded.foreach(d => assert(exprDims(d.id) == ((d.width, d.height))))
  }

  test("resize and frame-sample stubs") {
    val m = Multimodal.asMedia(docs, "doc_id", $"text".cast("binary"), "video")
    val r = m.select(Multimodal.resizeStub(
        Multimodal.decodeImageStub($"payload"), 224, 224).as("r"))
      .select("r.width", "r.height").as[(Int, Int)].collect()
    assert(r.forall(_ == ((224, 224))))
    val frames = m.select(Multimodal.frameSampleStub($"payload", 10))
      .as[Seq[Long]].collect()
    assert(frames.forall(fs => fs.nonEmpty && fs.head == 0L))
    assert(frames.forall(_.sliding(2).forall {
      case Seq(a, b) => b - a == 10; case _ => true }))
  }

  test("shardPack: byte-budget shards by exclusive prefix sum in id order") {
    // payload sizes: 10, 10, 10, 10 bytes with budget 25 ->
    // prefix 0,10,20,30 -> shards 0,0,0,1
    val m = Multimodal.asMedia(
      Seq((1L, "aaaaaaaaaa"), (2L, "bbbbbbbbbb"), (3L, "cccccccccc"),
        (4L, "dddddddddd")).toDF("doc_id", "text"),
      "doc_id", $"text".cast("binary"), "image")
    val got = Multimodal.shardPack(m, budgetBytes = 25L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L, 0L), (2L, 10L, 0L), (3L, 10L, 0L),
      (4L, 10L, 1L)))
  }

  test("phashNearDupPairs: identical payloads pair at hamming 0, capped by maxDist") {
    val m = Multimodal.asMedia(
      Seq((1L, "same payload bytes"), (2L, "same payload bytes"),
        (3L, "a completely different payload"), (4L, "same payload bytes"))
        .toDF("doc_id", "text"),
      "doc_id", $"text".cast("binary"), "image")
    val got = Multimodal.phashNearDupPairs(m)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // the three identical payloads form all three pairs at distance 0
    assert(got((1L, 2L)) == 0L && got((1L, 4L)) == 0L && got((2L, 4L)) == 0L)
    // nothing above the verify cap survives
    assert(got.values.forall(_ <= 3L))
    // hash is a bits-wide non-negative long and deterministic
    val ph = m.select(Multimodal.phashStub($"payload", 24)).as[Long].collect()
    assert(ph.forall(h => h >= 0L && h < (1L << 24)))
    assert(ph(0) == ph(1) && ph(0) == ph(3))
  }

  test("sceneChanges matches a Scala reference of the stub end-to-end") {
    import graft.functions.H60
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // independent reference: same stub arithmetic via H60.hash
    def ref(text: String, bits: Int = 24, everyN: Int = 10,
            cutMod: Int = 8, driftMax: Int = 6): Seq[(Long, Long, Long, Long)] = {
      val ck = md5hex(text)
      val h = H60.hash(text)
      val nFrames = ((h >> 32) % 240L) + 1L
      val frames = 0L.until(nFrames, everyN.toLong)
      var scene = 0L
      var out = Vector.empty[(Long, Long, Long, Long)]
      var prev = -1L
      for (f <- frames) {
        val cut = if (f > 0 && H60.hash(s"$ck:cut:$f") % cutMod == 0) 1L else 0L
        scene += cut
        val base = H60.hash(s"$ck:s:$scene") & ((1L << bits) - 1L)
        val dh = H60.hash(s"$ck:d:$f")
        val drift = (1L << (dh % bits).toInt) | (1L << ((dh >> 8) % bits).toInt)
        val ph = base ^ drift
        if (prev >= 0) {
          val ham = java.lang.Long.bitCount(ph ^ prev).toLong
          // detections OR true cuts: the complete confusion table
          if (ham > driftMax || cut == 1L) out :+= ((f, ham, scene, cut))
        }
        prev = ph
      }
      out
    }
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs of glee"))
    val media = Multimodal.asMedia(texts.toDF("doc_id", "text"),
      "doc_id", $"text".cast("binary"), "video")
    val got = Multimodal.sceneChanges(media)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.toSeq.map(r =>
        (r._2, r._3, r._4, r._5)).sortBy(_._1)).toMap
    texts.foreach { case (id, text) =>
      assert(got.getOrElse(id, Seq.empty) == ref(text),
        s"doc $id detector != reference")
    }
    // determinism across runs
    val again = Multimodal.sceneChanges(media)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(again == Multimodal.sceneChanges(media)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted)
  }

  test("bpe-ish tokens and rolling fingerprints") {
    val df = Seq((1L, "Hello world, it's 42 times!")).toDF("doc_id", "text")
    val n = df.select(size(TextOps.bpeishTokens($"text"))).as[Int].head()
    assert(n == 8)
    val fps = df.select(TextOps.rollingFingerprints($"text")).as[Seq[Long]].head()
    assert(fps.nonEmpty)
    assert(fps.forall(_ % 4 == 0))
    val fps2 = df.select(TextOps.rollingFingerprints($"text")).as[Seq[Long]].head()
    assert(fps == fps2)
  }
}
