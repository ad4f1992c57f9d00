package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the iterative graph operators (docs/EXPERIMENTS.md):
  * PageRank, connected components, and multi-source BFS over a
  * deterministic synthetic multigraph generated entirely inside the
  * engine (`spark.range` + Knuth multiplicative hashing — no data
  * files, no driver-side materialization, same posture as the native
  * Zipf source runs).
  *
  * Usage: runMain graft.GraphScale <nEdges> [nNodesDivisor=10] [cpus=32] [zipfSkew=0] [ops=all|pagerank,bfs,cc,inccc,lpa,kcore,sssp]
  * With zipfSkew > 0 the destination degrees follow Zipf(s) (the G3
  * quantile sweep) — node 0 is a hub receiving ~1/H(n,s) of ALL edges.
  * Prints one JSON line per operator with wall seconds and output rows.
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(1000000L)
    val div = args.lift(1).map(_.toLong).getOrElse(10L)
    val cpus = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val skew = args.lift(3).map(_.toDouble).getOrElse(0.0)
    val nNodes = math.max(2L, nEdges / div)
    // ops filter: "all" (default) or a comma list of
    // pagerank|bfs|cc|lpa|kcore — lets a probe re-measure one operator
    // without paying the whole battery
    val ops = args.lift(4).getOrElse("all")
    def want(op: String): Boolean = ops == "all" || ops.split(",").contains(op)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-graph-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v;k=v" — extra session confs (the PlanDump
    // contract): tier kill-switches, pin kill-switch, round-plan dir
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })

    // deterministic pseudo-random directed multigraph: src is a block
    // sweep (every node appears as a source, out-degree nEdges/nNodes),
    // dst an xxhash64 scatter. A plain multiplicative hash mod nNodes
    // would NOT work: for src = id % nNodes the lifts id + j·nNodes all
    // map to the same dst ((K·nNodes) mod nNodes = 0) and the graph
    // degenerates into a permutation — xxhash64 doesn't factor through
    // id mod nNodes
    val edgePlan =
      if (skew > 0)
        // Zipf in-degrees: dst = G3 quantile-sweep key (hub = node 0),
        // src = hash scatter of the row id (decorrelated from the
        // key-sorted rid order)
        graft.datagen.DataGen.zipfTable(spark, nEdges, nNodes, skew)
          .select(pmod(xxhash64(col("rid")), lit(nNodes)).as("src"),
            (col("key") - 1).as("dst"))
      else spark.range(nEdges).select(
        (col("id") % nNodes).as("src"),
        pmod(xxhash64(col("id")), lit(nNodes)).as("dst"))
    // materialize generation OUTSIDE the timed region so operator
    // timings are comparable across generator modes (the Zipf sweep's
    // window-cumsum + explode is generator cost, not graph cost)
    val (edges, _, _) = graft.operators.Iterate.ckpt(edgePlan)

    val counters = new Profile.Counters
    spark.sparkContext.addSparkListener(counters)
    def timed(name: String)(body: => Long): Unit = {
      counters.reset()
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","edges":$nEdges,"nodes":$nNodes,"sec":$s%.2f,"rows":$rows,"jobs":${counters.jobs},"stages":${counters.stages},"tasks":${counters.tasks},"shuf_write_mb":${counters.shufWrite / 1e6}%.1f,"shuf_read_mb":${counters.shufRead / 1e6}%.1f,"task_run_ms":${counters.runMs},"task_gc_ms":${counters.gcMs}}""")
      Console.out.flush()
    }

    if (want("pagerank")) timed("pagerank_6") {
      Graph.pageRank(edges, iters = 6, edgesDistinct = false).count()
    }
    if (want("bfs")) timed("bfs_6") {
      val seeds = spark.range(5).select(col("id").as("node"))
      Graph.bfs(edges.union(edges.select(col("dst").as("src"), col("src").as("dst"))),
        seeds, maxHops = 6).count()
    }
    if (want("cc")) timed("connected_components") {
      val (labels, rounds) = Dedup.connectedComponentsWithRounds(
        edges.select(col("src").as("a"), col("dst").as("b")))
      val n = labels.count()
      println(s"""{"op":"cc_rounds","rounds":$rounds}""")
      n
    }
    // incremental CC maintenance (VERDICT r6 #6): full labels over the
    // corpus-sized graph once (untimed prior state), then a FIXED
    // 2000-edge delta folded in — the contraction rounds see only the
    // contracted delta graph, the standing table pays two hash joins,
    // so across nEdges sweeps the per-delta cost must stay flat-ish
    // (join passes over labels) while full recompute grows with rounds
    // × edges. Self-check: incremental == full recompute on the union.
    if (want("inccc")) {
      val ccEdges = edges.select(col("src").as("a"), col("dst").as("b"))
      val (labels, _, _) = graft.operators.Iterate.ckpt(
        Dedup.connectedComponents(ccEdges))
      val nDelta = 2000L
      // delta: fresh nodes past the id range bridging random existing
      // nodes — every edge merges or extends an existing component
      val (delta, _, _) = graft.operators.Iterate.ckpt(
        spark.range(nDelta).select(
          (col("id") + nNodes).as("a"),
          pmod(xxhash64(col("id") + 7L), lit(nNodes)).as("b")))
      var inc: org.apache.spark.sql.DataFrame = null
      timed("cc_incremental_delta2k") {
        inc = Dedup.incrementalConnectedComponents(labels, delta)
          .localCheckpoint(true)
        inc.count()
      }
      var full: org.apache.spark.sql.DataFrame = null
      timed("cc_full_recompute") {
        full = Dedup.connectedComponents(ccEdges.union(delta))
          .localCheckpoint(true)
        full.count()
      }
      val diff = inc.except(full).limit(1).count() + full.except(inc).limit(1).count()
      println(s"""{"op":"inccc_check","diff":$diff,"ok":${diff == 0}}""")
    }
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    if (want("lpa")) timed("label_prop_4") {
      Graph.labelPropagation(sym, iters = 4).count()
    }
    // k at HALF the mean symmetrized degree: the uniform multigraph has
    // no dense community, so a mean-degree core peels to EMPTY (a valid
    // fixed point, measured) — half-mean leaves a substantial core
    // while still cascading
    val coreK = math.max(2L, nEdges / nNodes).toInt
    if (want("kcore")) timed(s"kcore_$coreK") {
      Graph.kCore(sym, coreK, iters = 4).count()
    }
    // weighted SSSP: hash-derived weights in [1,100], 5 seed nodes —
    // measures the frontier-restricted relaxation's settling behavior
    // (round joins shrink as distances stabilize) at edge scale
    if (want("sssp")) timed("sssp_6") {
      val wEdges = sym.withColumn("w",
        pmod(xxhash64(col("src"), col("dst")), lit(100L)) + 1L)
      val seeds = spark.range(5).select(col("id").as("node"))
      Graph.sssp(wEdges, seeds, rounds = 6).count()
    }
    spark.stop()
  }
}
