package graft

/** Physical-plan dump for plan review (PLANS.md): prints the formatted plan
  * of each named entry (all entries when none named) over the given sf dir.
  *
  * Usage: runMain graft.PlanDump <sfDir> [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = GraftSession.get()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        println(s"==== $name ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
