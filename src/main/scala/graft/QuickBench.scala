package graft

/** Optimization-loop timing harness (guide §1): time a SUBSET of the
  * declared queries at the given SF without paying the full-bench
  * warmup. One warm pass of each selected query runs first (codegen +
  * store builds land there), then `SPARK_GRAFT_QB_RUNS` timed passes;
  * per-query MIN is printed. Relative numbers for before/after
  * comparisons only — the durable artifact stays graft.Bench.
  *
  * Usage: runMain graft.QuickBench <sfDir> <query...>
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_QB_RUNS", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = names.map(n => n -> SparkEntry.queries(n))
    sel.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[qb-warm] ${e.getMessage}") }
      graft.core.Scratch.release()
    }
    val times = (1 to runs).map { _ =>
      graft.operators.Graph.invalidateResultMemos()
      sel.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Scratch.release()
        name -> dt
      }.toMap
    }
    sel.foreach { case (name, _) =>
      val best = times.map(_(name)).min
      println(f"[quickbench] $name%-24s $best%8.3f s (min of $runs)")
    }
    spark.stop()
  }
}
