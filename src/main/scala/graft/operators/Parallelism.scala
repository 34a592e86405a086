package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for CPU-heavy row-local stages.
  *
  * A parquet scan parallelizes by row group; a small table written as one
  * row group becomes ONE task, pinning every downstream kernel (minhash,
  * parse_money, simhash) to a single core no matter how many executors
  * exist. At 100 TB the scan yields thousands of partitions and this helper
  * is a no-op — it only ever RAISES the partition count, so it never
  * introduces a harmful shuffle at scale (and the shuffle it does add moves
  * exactly the small input that caused the problem).
  */
object Parallelism {

  /** Round-robin to at least `n` partitions iff the plan currently yields
    * fewer. The count comes from the plan's output partitioning when the
    * planner knows it (post-shuffle stages); a file scan reports
    * UnknownPartitioning(0), so fall back to the physical RDD's partition
    * count — `toRdd`, not `df.rdd`, which would wrap a second
    * Row-conversion lineage around the plan just to ask for a number.
    * Intended for scan-stage inputs: probing a plan with shuffles under AQE
    * would materialize its stages to answer. */
  def ensureMinPartitions(df: DataFrame, n: Int): DataFrame = {
    val known = df.queryExecution.executedPlan.outputPartitioning.numPartitions
    val current = if (known > 0) known else df.queryExecution.toRdd.getNumPartitions
    if (current >= n) df else df.repartition(n)
  }

  /** [[ensureMinPartitions]] at the session's default parallelism. */
  def ensureDefaultParallelism(df: DataFrame): DataFrame =
    ensureMinPartitions(df, df.sparkSession.sparkContext.defaultParallelism)
}
