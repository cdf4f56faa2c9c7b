package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + datasource init cost seconds on
    // the first jobs of a JVM; without this the alphabetically-first
    // query absorbs it all. Touch every table's footer and push one
    // tiny job through the join/window/agg/regexp codegen paths —
    // infrastructure warmup only, no query work is precomputed.
    try {
      import org.apache.spark.sql.functions._
      spark.range(1000000).selectExpr("sum(id)").write
        .mode("overwrite").format("noop").save()
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"))
        try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).write
          .mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("id")
      spark.range(10000)
        .selectExpr("id", "id % 10 AS g", "CAST(id AS STRING) AS s")
        .withColumn("t", split(regexp_replace(lower(col("s")), "0", " "), " "))
        .withColumn("rn", row_number().over(w))
        .join(spark.range(10).selectExpr("id AS g2"), col("g") === col("g2"))
        .groupBy("g").agg(count(lit(1)), sum("id"))
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    // noop sink: forces full evaluation of every output column
    // (count() would let Catalyst prune the projection and undercount
    // the real work).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
