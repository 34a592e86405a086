package graft

/** Scratch inspection harness: `runMain graft.ShowQuery <sfDir> <q>...` —
  * prints each named entry's result rows (truncation off) plus its row
  * count. For local iteration only; the oracle gate stays Verify's job. */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"== $n ==")
      df.show(100, truncate = false)
    }
    spark.stop()
  }
}
