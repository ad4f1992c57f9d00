package graft

import graft.functions.GraftFunctions
import graft.plans.ZipfSource
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade — the single import a user of the reference needs
  * to switch engines:
  *
  * {{{
  * val spark = Graft.session()                  // tuned local session
  * Graft.registerViews(spark, "/data/sf0.1")    // tables as SQL views
  * spark.sql("SELECT ... FROM lineitem ...")    // plain SQL surface
  * Graft.query("dedup_minhash_lsh")(spark, dir) // named operators
  * }}}
  */
object Graft {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Opinionated local session: AQE on, shuffle parallelism = cores,
    * UTC, nanos-tolerant parquet, graft SQL functions + the native Zipf
    * strategy installed. */
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    configure(spark)
    spark
  }

  /** Install graft's functions and planner strategy into an existing
    * session (idempotent). */
  def configure(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    ZipfSource.install(spark)
    plans.ArgmaxRewrite.install(spark)
    spark
  }

  /** Register every testdata table as a temp view so `spark.sql` works
    * with the same names the DuckDB oracle uses. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      if (new java.io.File(s"$sfDir/$t.parquet").exists())
        Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Named operator lookup (SparkEntry registry). */
  def query(name: String): (SparkSession, String) => DataFrame =
    SparkEntry.queries(name)
}
