package graft

/** Scratch timing harness: `runMain graft.TimeQuery <sfDir> <reps> <q>...`
  * — runs each named entry `reps` times (count() action, no write) and
  * prints per-rep seconds. For local perf iteration only. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session (parquet footers, codegen cache)
    names.foreach { n => SparkEntry.queries(n)(spark, sfDir).count() }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
    }
    spark.stop()
  }
}
