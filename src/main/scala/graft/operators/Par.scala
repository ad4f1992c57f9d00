package graft.operators

/** Concurrent submission of INDEPENDENT Spark actions from the driver
  * (guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because driver
  * code calls them sequentially. The store-maintenance verbs here
  * (index append/compact) are bundles of 2-4 small independent write
  * jobs whose wall cost is dominated by per-job fixed latency (plan +
  * schedule + commit, ~0.3-0.5 s each at bench scale); submitting them
  * from a transient thread pool overlaps those latencies, and at
  * cluster scale lets the tail of one job back-fill executors freed by
  * another. Results come back in input order; the first failure
  * rethrows after all threads finish (no torn half-submitted state
  * beyond what sequential code could also leave — the repair verbs'
  * crash contract already covers any subset of the writes landing).
  *
  * Thread-inherited state: each task runs in a fresh thread per call,
  * so Spark's inheritable thread-locals (job group/description) flow
  * from the caller exactly as the guide's ThreadPoolExecutor example
  * relies on. */
object Par {
  def run[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(t => t())
    val results =
      new java.util.concurrent.atomic.AtomicReferenceArray[Either[Throwable, A]](
        thunks.size)
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => {
        results.set(i,
          try Right(t())
          catch { case e: Throwable => Left(e) })
      }, s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val out = (0 until thunks.size).map(results.get)
    out.collectFirst { case Left(e) => e }.foreach(e => throw e)
    out.map(_.toOption.get)
  }

  /** [[run]] for side-effecting actions. */
  def unit(thunks: (() => Unit)*): Unit = { run[Unit](thunks); () }
}
