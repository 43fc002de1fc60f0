package graft.core

/**
 * Iterator-driven per-key grouping for the spillable secondary-sort
 * pattern (VERDICT r2 #3): batch FSM faces run as
 *
 *   ds.repartition(col(key))                       // one shuffle on the key
 *     .sortWithinPartitions(key, ts, tiebreak)     // external, spillable sort
 *     .mapPartitions(it => runs(it)(keyFn).flatMap { case (k, events) =>
 *       /* lazily fold the FSM over `events`, emitting as it goes */ })
 *
 * Unlike `groupByKey(...).flatMapGroups { it.toVector.sortBy ... }`,
 * nothing is ever materialized per key: Spark's sort spills to disk,
 * and the FSM consumes one row at a time with O(state) memory — a
 * single hot key with 10^8 events streams through instead of building
 * a 10^8-element Vector on one executor thread.
 */
object SecondarySort {

  /**
   * Split a key-sorted iterator into consecutive same-key runs without
   * buffering. Each inner iterator is only valid until the outer
   * iterator advances; advancing the outer iterator first drains any
   * unconsumed remainder of the current run (so partially-consumed
   * runs are safe, if wasteful).
   */
  def runs[T, K](iter: Iterator[T])(key: T => K): Iterator[(K, Iterator[T])] =
    new Iterator[(K, Iterator[T])] {
      private val buf = iter.buffered
      private var cur: Iterator[T] = Iterator.empty
      private def drain(): Unit = while (cur.hasNext) cur.next()
      def hasNext: Boolean = { drain(); buf.hasNext }
      def next(): (K, Iterator[T]) = {
        drain()
        val k = key(buf.head)
        cur = new Iterator[T] {
          def hasNext: Boolean = buf.hasNext && key(buf.head) == k
          def next(): T = buf.next()
        }
        (k, cur)
      }
    }
}
