package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (Verify, Bench, tests)
  * runs with the same scale-oriented configuration.
  *
  * Settings are chosen for the local[N] harness but mirror what we would set
  * on a real cluster: AQE on (runtime re-plan + skew-join splitting),
  * shuffle partitions sized to cores (not the 200 default), UTC session time
  * zone for oracle parity.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    // "local[N]" and "local[N,maxFailures]" both carry a thread count;
    // anything unparseable falls back to the machine's processors
    val cores = master match {
      case s if s.startsWith("local[") && !s.contains("*") =>
        scala.util.Try(
          s.stripPrefix("local[").stripSuffix("]").split(",")(0).trim.toInt)
          .getOrElse(Runtime.getRuntime.availableProcessors())
      case _ => Runtime.getRuntime.availableProcessors()
    }
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // functions + optimizer rules also register post-hoc
      // (Functions.register), but RESOLUTION rules (view expansion)
      // only exist as a session-build hook — wire them here so every
      // entry point gets the full SQL surface
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type, so
      // read as long and convert (Tables.events) — exact integer division.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    spark
  }
}
