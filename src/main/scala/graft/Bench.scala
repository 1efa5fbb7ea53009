package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. One warm-up pass absorbs session/codegen startup,
  * then each query runs 3 times and reports the per-query median — so
  * round-over-round deltas reflect plans, not JIT noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated subset for profiling experiments
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Warm-up: run everything once (codegen + parquet footer caches warm).
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = queries.map { case (name, fn) =>
      // measurement hygiene: drain the previous query's dead checkpoint /
      // shuffle blocks (ContextCleaner frees them only after a driver GC
      // notices the dropped references) so each query is timed against a
      // clean block manager, not its predecessor's garbage — the prime
      // suspect for r3's unreproducible 2-3× smears on unrelated queries
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2) // median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also land the full artifact on disk: the driver's stdout capture has
    // truncated the alphabetical head of the per-query map before (r4) —
    // a file copy keeps every timing reviewable regardless
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
