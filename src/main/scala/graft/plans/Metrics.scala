package graft.plans

/** Tiny process-wide metrics registry for "reported, never silent" events
  * (the repo rule established at EdgeDeriver's hub cap): whenever an
  * operator takes a capped/fallback path instead of its full work — e.g. a
  * refinement skipped because the gather bound was exceeded — it MUST both
  * log the event and bump a named counter here, so tests and the bench can
  * assert the fallback was (or wasn't) taken.
  */
object Metrics {

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()

  /** Bump `name` and log one stderr line with the event's context. */
  def event(name: String, detail: String): Unit = {
    counters.computeIfAbsent(name, _ => new java.util.concurrent.atomic.LongAdder())
      .increment()
    System.err.println(s"[metrics] $name: $detail")
  }

  def count(name: String): Long = {
    val c = counters.get(name)
    if (c == null) 0L else c.sum()
  }

  /** Immutable snapshot of every counter (for bench/ledger emission). */
  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.sum() }.toMap
  }

  def reset(): Unit = counters.clear()
}
