package graft

/** Per-JVM memo for query-entry FIXTURES — the stored tables/indexes an
  * entry probes but does not measure (q32's bucketed tables, d12's stored
  * LSH index). In production those artifacts are written once at layout
  * time and reused across thousands of queries; an entry that rebuilds its
  * fixture on every call times the setup, not the operator, and hides
  * regressions in the part that matters (VERDICT r06 flagged exactly
  * this). Memoized per (kind, data dir, Spark application) within one
  * JVM: the bench's two-pass per-query-min pays construction in pass 1
  * and reports the pure probe from pass 2, while a standalone Verify
  * call — one JVM, one call — still builds everything itself, so the
  * correctness gate's results are byte-identical. The application id in
  * the key matters because fixtures are session-bound (catalog table
  * names, DataFrame plans): a stopped-and-recreated session in the same
  * JVM must rebuild, not resurrect handles into a dead context. */
object Fixtures {
  // ConcurrentHashMap.computeIfAbsent runs the builder AT MOST ONCE per
  // key (TrieMap.getOrElseUpdate does not — two racing threads can both
  // run a builder that drops/rewrites catalog tables and parquet dirs,
  // clobbering each other mid-build)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Any]

  def once[T](spark: org.apache.spark.sql.SparkSession, kind: String,
              dir: String)(build: => T): T =
    memo.computeIfAbsent((spark.sparkContext.applicationId, kind, dir),
      _ => build).asInstanceOf[T]
}
