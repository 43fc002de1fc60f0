package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify, Bench, and tests
  * agree on semantics.
  *
  *  - UTC session time zone (oracle parity).
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    splitting — the 100 TB safety nets.
  *  - `parquet.nanosAsLong`: the driver `events` table stores
  *    TIMESTAMP(NANOS) which Spark's vectorized reader refuses;
  *    reading as long + explicit integer `div 1000` to micros is
  *    lossless (ns epochs overflow double's 53-bit mantissa, so the
  *    conversion must never route through floating point).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
