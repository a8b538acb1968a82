package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Build counters for the session-shared intermediate caches
  * (postings, pair graph, CC labels, k-means run, BPE run, kNN graph,
  * …). Each cache's compute lambda bumps its label exactly when it
  * actually BUILDS — so a concurrency soak (CacheSoakSpec) can assert
  * the computeIfAbsent contract end-to-end: N racing consumers on one
  * session produce ONE build per cache, not N. Zero cost in production
  * paths (one atomic increment per cache miss). */
object CacheStats {
  private val builds = new ConcurrentHashMap[String, AtomicLong]()

  /** Called inside a cache's compute lambda. */
  private[graft] def recordBuild(label: String): Unit =
    builds.computeIfAbsent(label, _ => new AtomicLong).incrementAndGet()

  private[graft] def buildCount(label: String): Long = {
    val c = builds.get(label)
    if (c == null) 0L else c.get()
  }
}
