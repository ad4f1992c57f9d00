package graft.queries

/** Per-phase wall-clock attribution for multi-verb lifecycle queries
  * (build → gate → append → compact → serve): each phase body must be
  * EAGER (writers materialize, gates localCheckpoint) so the nanoTime
  * span is honest; `emit` prints one `[bench-phase]` JSON line into the
  * Verify/Bench log per run — VERDICT r6/r7 asked that no lifecycle
  * query's cost be unattributable to a verb. */
private[queries] final class Phases(q: String) {
  private val xs = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

  def apply[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    xs += ((name, (System.nanoTime() - t0) / 1e9))
    r
  }

  /** `extra` lands verbatim before the closing brace — pass
    * `,"key":value` pairs or the empty string. */
  def emit(extra: String = ""): Unit =
    println(xs.map { case (n, sec) => f""""$n":$sec%.2f""" }
      .mkString(s"""[bench-phase] {"q":"$q",""", ",", s"$extra}"))
}
