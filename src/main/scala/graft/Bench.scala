package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query at the configured
  * scale factor and prints ONE JSON line. Config mirrors the production
  * posture (AQE on, shuffle partitions = cores — the reference fixed
  * numReducers=100 for a 17-node cluster; on local[N] that would just
  * add scheduling overhead). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/session warmup outside the timed region: one tiny action so the
    // first measured query doesn't pay SparkSession + codegen bootstrap
    spark.range(10).count()

    val results = SparkEntry.registry.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}") }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
