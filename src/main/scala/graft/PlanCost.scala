package graft

/** Floor-study harness (round-16 ask): split each entry's wall time into
  * BUILD (entry function: fixtures memo-hit + DataFrame construction),
  * PLAN (analysis + optimization + physical planning, forced via
  * `queryExecution.executedPlan`), and EXEC (the noop write: job
  * scheduling + AQE re-planning + actual compute). The sub-second tail of
  * the registry is floor-dominated; this tool says which floor.
  *
  * Usage: runMain graft.PlanCost <sfDir> <reps> <q>... — per-entry mins
  * over `reps` fresh builds. `__baseline` times `spark.range(1)` through
  * the same noop sink (pure scheduling floor, no SQL planning to speak
  * of). For local study only; the bench contract is untouched. */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def buildOf(n: String): org.apache.spark.sql.DataFrame =
      if (n == "__baseline") spark.range(1).toDF()
      else SparkEntry.queries(n)(spark, sfDir)
    // warm: codegen caches, parquet footers, fixtures
    names.foreach(n =>
      buildOf(n).write.format("noop").mode("overwrite").save())
    names.foreach { n =>
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = buildOf(n)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis -> physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def mn(f: ((Double, Double, Double)) => Double) = t.map(f).min
      println(f"PLANCOST $n%-28s build=${mn(_._1)}%.3f plan=${mn(_._2)}%.3f " +
        f"exec=${mn(_._3)}%.3f total=${mn(x => x._1 + x._2 + x._3)}%.3f")
    }
    spark.stop()
  }
}
