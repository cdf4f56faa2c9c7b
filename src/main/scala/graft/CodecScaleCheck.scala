package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.SparkSession

import graft.operators.Multimodal

/**
 * Dev-only decode-throughput probe for the REAL image codec (r9
 * verdict item 3): generates tens of thousands of genuine PNG payloads
 * (constant-color 64×64 — pixel sums analytic from the id, so the run
 * also VERIFIES every decode), then times
 * [[Multimodal.decodeImagesBatched]] over them at two corpus scales
 * and three batch sizes.
 *
 * Methodology follows ScaleCheck's hard-won rules: generation is
 * checkpointed OUTSIDE the timed window (the probe times decode, not
 * PNG encode); partition count scales with the corpus (constant
 * partition size); byte counters ride along to show the decode stage
 * is payload-local (zero shuffle). Peak decoded state per task is
 * `batchSize` images BY CONSTRUCTION (the `grouped(batchSize)`
 * iterator never holds more), which the batch-shape spec pins; the
 * batchSize sweep here shows the wall-time cost of that bound.
 *
 * Usage: runMain graft.CodecScaleCheck [n20x] (default 10000; the
 * second scale is 5× that).
 */
object CodecScaleCheck {

  /** Deterministic synthetic PNG: 64×64, constant RGB derived from the
    * id. Analytic ground truth: each channel sum = 4096 × its value. */
  def pngBytes(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id * 31) % 256) << 16 | ((id * 17) % 256) << 8 |
      (id % 256)).toInt
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n20 = args.headOption.flatMap(_.toLongOption).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val listener = new graft.streaming.TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    def settled(): graft.streaming.ResourceSummary = {
      var last = -1L
      while (last != listener.samples.size.toLong) {
        last = listener.samples.size.toLong; Thread.sleep(100)
      }
      listener.summary
    }
    for (n <- Seq(n20, n20 * 5)) {
      // constant partition SIZE (~2500 payloads each), generation
      // checkpointed before any clock starts
      val parts = math.max(4L, n / 2500L).toInt
      val media = spark.range(n).repartition(parts)
        .as[Long].map(i => Multimodal.MediaRow(i, pngBytes(i)))
        .localCheckpoint(true)
      require(media.count() == n)
      for (bs <- Seq(16, 64, 256)) {
        val t = (1 to 2).map { _ =>
          listener.reset()
          val t0 = System.nanoTime()
          Multimodal.decodeImagesBatched(media, batchSize = bs)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        val res = settled()
        println(f"CODECSCALE n=$n%7d batch=$bs%4d wall=$t%7.2fs " +
          f"rows_per_s=${n / t}%9.0f ${res.render}")
      }
      // every decode verified against the analytic pixel sums — a
      // throughput number for a wrong decode would be worthless
      val bad = Multimodal.decodeImagesBatched(media, batchSize = 64)
        .filter(r => !(r.width == 64 && r.height == 64 &&
          r.sumR == 4096L * ((r.id * 31) % 256) &&
          r.sumG == 4096L * ((r.id * 17) % 256) &&
          r.sumB == 4096L * (r.id % 256)))
        .count()
      require(bad == 0L, s"$bad wrong decodes at n=$n")
      println(s"CODECSCALE n=$n decode verified exact (0 mismatches)")
      graft.util.Checkpoints.release(media.toDF())
    }
    spark.stop()
  }
}
