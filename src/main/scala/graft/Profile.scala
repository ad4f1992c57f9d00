package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): runs a subset of
  * registry queries (SPARK_GRAFT_ONLY, same contract as Bench) and
  * prints per-query Spark-level cost counters — jobs, stages, tasks,
  * shuffle bytes/records, executor run/GC time — so a slow query's wall
  * can be attributed to job-count overhead vs shuffle volume vs compute
  * before anything is changed. Times like Bench (count() action,
  * best-of-2 optional via SPARK_GRAFT_RUNS). Not part of the driver
  * contract; a debugging tool like MicroBench. */
object Profile {
  final class Counters extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    @volatile var runMs = 0L
    @volatile var gcMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        shufRead += m.shuffleReadMetrics.totalBytesRead
        runMs += m.executorRunTime
        gcMs += m.jvmGCTime
      }
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; shufWrite = 0L; shufRead = 0L
      runMs = 0L; gcMs = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
    // SPARK_GRAFT_CONF="k=v;k=v" — extra confs for A/B probes (the
    // PlanDump contract); context-level keys (spark.buffer.*) included
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";").filter(_.nonEmpty))
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count()
    val c = new Counters
    spark.sparkContext.addSparkListener(c)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.registry.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name))).foreach { q =>
      var best = Double.MaxValue
      var line = ""
      for (_ <- 1 to runs) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        c.reset()
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[profile] ${q.name} failed: ${e.getMessage}") }
        val sec = (System.nanoTime() - t0) / 1e9
        // per-run trail on stderr: run-over-run drift (e.g. a second
        // run slowing under the first run's retained blocks) is itself
        // a diagnostic signal the best-of line hides
        System.err.println(f"""[profile-run] {"q":"${q.name}","sec":$sec%.3f,"jobs":${c.jobs},"shuf_read_mb":${c.shufRead / 1e6}%.1f,"task_run_ms":${c.runMs},"task_gc_ms":${c.gcMs}}""")
        if (sec < best) {
          best = sec
          line = f"""[profile] {"q":"${q.name}","sec":$sec%.3f,"jobs":${c.jobs},"stages":${c.stages},"tasks":${c.tasks},"shuf_write_mb":${c.shufWrite / 1e6}%.1f,"shuf_read_mb":${c.shufRead / 1e6}%.1f,"task_run_ms":${c.runMs},"task_gc_ms":${c.gcMs}}"""
        }
      }
      println(line)
      Console.out.flush()
    }
    spark.stop()
  }
}
