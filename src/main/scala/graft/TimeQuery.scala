package graft

/** Scratch timing harness: `runMain graft.TimeQuery <sfDir> <reps> <q>...`
  * — runs each named entry `reps` times through the noop sink (same action
  * as Bench: count() would let column pruning delete the very kernels being
  * measured from projection-only plans) and prints per-rep seconds. For
  * local perf iteration only. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm the session (parquet footers, codegen cache)
    names.foreach(run)
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run(n)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
    }
    spark.stop()
  }
}
