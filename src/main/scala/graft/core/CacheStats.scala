package graft.core

/** Driver-side memo-hit counter — BENCH PROVENANCE, not a cache.
  * Cross-query driver memos (the Dedup label cache, the ShortcutOps
  * store handles, the VectorIndex model cache) legitimately serve
  * later queries warm inside one session; that is correct for suite
  * totals but makes a per-op number like d_cluster's 0.12 s read as a
  * real cost. Every memo HIT bumps this counter, and [[graft.Bench]]
  * diffs it around each timed query to publish a per-query
  * `served_warm` flag in the record (VERDICT r7 #6). Never read by
  * any operator; zero behavior influence. */
object CacheStats {
  val hits = new java.util.concurrent.atomic.AtomicLong

  def hit(): Unit = { hits.incrementAndGet(): Unit }
}
