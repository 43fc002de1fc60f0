package graft.core

import scala.collection.concurrent.TrieMap

/** Build-once memoization for the session-scoped store caches.
  *
  * `TrieMap.getOrElseUpdate` is lock-free: under a concurrent first
  * read it may evaluate the builder in SEVERAL racing threads and keep
  * only one result — fine for pure values, wrong for store builders
  * whose side effects escape (a loser's persisted frame strands cached
  * blocks forever; two racing writers of the same parquet store
  * directory corrupt it). Serializing the build behind the cache's own
  * monitor makes the first build exactly-once; warm reads take the
  * lock-free hit-path and never contend, so a FAIR-scheduled
  * concurrent workload serves every memoized store from one build
  * (ConcurrencySpec pins both properties).
  */
object Memo {
  def once[K, V](cache: TrieMap[K, V], key: K)(build: => V): V =
    cache.getOrElse(key, cache.synchronized { cache.getOrElseUpdate(key, build) })
}
