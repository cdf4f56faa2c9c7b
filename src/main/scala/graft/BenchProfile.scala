package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev-only profiling harness: runs the named queries (or all) `reps`
 * times in one warm session and prints per-run timings, so real
 * per-query cost is visible without JVM/codegen warmup noise.
 *
 * Usage: runMain graft.BenchProfile [reps] [query ...]
 */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // first arg is reps only if numeric; `BenchProfile q1 q2` works too
    val (reps, rest) = args.headOption.flatMap(a => a.toIntOption) match {
      case Some(n) => (n, args.drop(1).toSeq)
      case None => (2, args.toSeq)
    }
    val names = if (rest.nonEmpty) rest
                else SparkEntry.queries.keys.toSeq.sorted
    names.find(!SparkEntry.queries.contains(_)).foreach { bad =>
      sys.error(s"unknown query '$bad'; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.range(1000000).selectExpr("sum(id)").write
      .mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    def time(label: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $label%-28s ${ts.map(t => f"$t%8.3f").mkString(" ")}")
    }
    for (name <- names) {
      time(name, SparkEntry.queries(name))
      // fixture/operator split (r13 verdict item 8): print the
      // fixture-construction-only twin right under its parent so a
      // bench mover self-attributes
      SparkEntry.profileVariants.get(s"${name}__fixture")
        .foreach(time(s"${name}__fixture", _))
    }
    spark.stop()
  }
}
