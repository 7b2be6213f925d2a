package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-thread registry of DataFrames persisted inside an operator call, so
  * the caller can release them once the (lazy) result is materialized.
  *
  * Why thread-local: the operators persist intermediate sketch/projection
  * frames that the caller consumes AFTER the function returns (the result
  * is lazy), so release must be deferred to the caller — but a
  * process-global registry meant concurrent callers released each other's
  * caches mid-query (silent recompute, defeating the single-scan
  * optimizations) and a forgotten release pinned frames via strong
  * references for the session lifetime. Scoping the registry to the
  * calling thread makes `tracked(df)` + the matching `releaseCaches()`
  * a per-call contract: every query-pack lambda, pipeline composition,
  * foreachBatch body and test in this repo builds and releases on one
  * thread, and callers on different threads can no longer interact.
  *
  * Contract: call the owning object's `releaseCaches()` on the SAME thread
  * that invoked the operator, once the result is materialized. A release
  * on a thread with nothing tracked is a no-op. If a thread never
  * releases, its list dies with the thread; the underlying Spark cache
  * entries are then freed only by `cacheManager.clearCache()` — the
  * Verify/Bench harnesses call that per query as the backstop.
  */
private[operators] final class CacheRegistry {
  private val local = new ThreadLocal[java.util.ArrayList[DataFrame]] {
    override def initialValue(): java.util.ArrayList[DataFrame] =
      new java.util.ArrayList[DataFrame]()
  }

  def tracked(df: DataFrame): DataFrame = { local.get().add(df); df }

  /** Position marker for [[releaseSince]]: everything tracked by this
    * thread AFTER the mark can be released as a scoped group while
    * earlier frames (the caller's) stay pinned. */
  def mark(): Int = local.get().size()

  /** Unpersist and forget every frame this thread tracked after `mark`,
    * newest portion only — the scoped-release primitive for operators
    * whose PROLOGUE (e.g. a preflight) fully consumes its caches before
    * the main plan executes: releasing them early halves peak cache
    * memory without touching frames the caller still owns. */
  def releaseSince(mark: Int): Unit = {
    val l = local.get()
    var i = l.size() - 1
    while (i >= mark && i >= 0) {
      l.remove(i).unpersist(blocking = false)
      i -= 1
    }
  }

  /** Unpersist every frame tracked by the current thread since its last
    * release, oldest first. Safe while other threads run: only this
    * thread's frames are touched. */
  def releaseAll(): Unit = {
    val l = local.get()
    val it = l.iterator()
    while (it.hasNext) it.next().unpersist(blocking = false)
    l.clear()
    local.remove()
  }
}
