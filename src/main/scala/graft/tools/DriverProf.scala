package graft.tools

/** Env-gated (`SPARK_GRAFT_PROF=1`) driver-side phase profiler: a static
  * label → (calls, nanos) accumulator with zero overhead when off. The
  * per-trigger residual in the composed streaming sinks is DRIVER time
  * (catalog round-trips, manifest IO, plan analysis — the q120 profile),
  * which wall-clock A/Bs on a drifting host can't attribute; this
  * instrument says exactly which fixed cost each trigger pays, so the
  * optimization work targets the measured term instead of a hypothesis.
  * Dev-only: nothing in the gate or bench paths reads it.
  */
object DriverProf {
  val on: Boolean = sys.env.get("SPARK_GRAFT_PROF").contains("1")

  private final class Cell {
    val calls = new java.util.concurrent.atomic.AtomicLong
    val nanos = new java.util.concurrent.atomic.AtomicLong
  }
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, Cell]

  @inline def time[T](label: String)(f: => T): T =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val c = acc.computeIfAbsent(label, _ => new Cell)
        c.calls.incrementAndGet()
        c.nanos.addAndGet(System.nanoTime() - t0)
        ()
      }
    }

  /** stderr table, most expensive first; resets nothing. */
  def dump(tag: String = ""): Unit = if (on) {
    import scala.jdk.CollectionConverters._
    val rows = acc.asScala.toSeq
      .map { case (k, c) => (k, c.calls.get, c.nanos.get / 1e6) }
      .sortBy(-_._3)
    System.err.println(s"[prof$tag] ${"label".padTo(40, ' ')} calls  total_ms  ms/call")
    rows.foreach { case (k, n, ms) =>
      System.err.println(
        f"[prof$tag] ${k.padTo(40, ' ')} $n%5d  $ms%8.1f  ${ms / math.max(1, n)}%7.2f")
    }
  }

  def reset(): Unit = acc.clear()
}
