package graft

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for a set of registry queries into
  * files — the optimization-round plan evidence (plans/r12/). Usage:
  *
  *   SPARK_GRAFT_ONLY="a,b" sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix>"
  *
  * Writes <outDir>/<query>_<suffix>.txt per query. The plan captured is
  * the one the query RETURNS; lifecycle bundles that materialize
  * internally (index writes, checkpointed walks) surface as LogicalRDD
  * leaves here, with the internal physical story documented in
  * OPTIMIZATION_r12.md. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r12")
    val suffix = args.lift(2).getOrElse("after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_CONF="k=v;k=v" — session confs for the dump (e.g.
    // tier kill-switches to capture the distributed BEFORE plans on
    // current code, which is identical to the pre-change plan)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.registry.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name))).foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        df.count() // finalize AQE so the formatted plan is the executed one
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${q.name}_$suffix.txt"), txt)
        println(s"[plandump] ${q.name} -> $outDir/${q.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
