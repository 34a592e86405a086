package graft

import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Runtime proof of the cell joins' skew posture. d14/d11/s08 block their
  * pair mining on derived IVF cells; the codebook keeps cells balanced for
  * well-spread corpora, but a pathological corpus (mass duplication of one
  * document) can still concentrate one cell. The stated posture is "AQE's
  * skew-join splits that straggler at runtime" — this spec makes that an
  * executed fact instead of prose: it builds a deliberately skewed cell
  * histogram, runs the exact d14 join shape (self equi-join on `cell`,
  * `id_a < id_b`), and asserts from the final adaptive plan that
  * `OptimizeSkewedJoin` FIRED (`SortMergeJoin(skew=true)` / a skewed
  * AQEShuffleRead) — and that the skew-split run returns row counts
  * identical to the same join with skew handling off.
  *
  * Thresholds are scaled down (20 KB skew threshold vs the 256 MB
  * default) because the trigger condition is RELATIVE — partition bytes
  * vs max(threshold, factor x median) — so a small corpus under a small
  * threshold exercises the same code path a 100 TB corpus hits under the
  * production default. */
class AqeSkewSpec extends SparkTestBase {

  /** Deep collect over an adaptive plan: TreeNode.collect stops at query
    * stages (their plans are not `children`), so the skew-marked SMJ
    * inside a ResultQueryStage is invisible to it. */
  private def deepCollect[T](plan: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = pf.lift(plan).toSeq
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case p                        => p.children
    }
    here ++ (kids ++ plan.subqueries).flatMap(deepCollect(_)(pf))
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** One hot cell carrying ~1/3 of rows (and far more bytes than any
    * other shuffle partition) plus a uniform 62-cell tail. The payload is
    * sha2-derived — incompressible — so the hot partition's SHUFFLE BYTES
    * (what AQE measures, post-lz4) reflect the skew. */
  private lazy val skewed = {
    val pad = concat((0 to 3).map(i =>
      sha2(concat(col("id").cast("string"), lit(s"_$i")), 256)): _*)
    spark.range(0, 4600).select(
      col("id"),
      when(col("id") < 1500, lit(0))
        .otherwise((pmod(col("id"), lit(62)) + 1).cast("int")).as("cell"),
      pad.as("pad"))
  }

  private def cellSelfJoinCount(): (Long, org.apache.spark.sql.execution.SparkPlan) = {
    val a = skewed.select(col("cell"), col("id").as("id_a"))
    val b = skewed.select(col("cell"), col("id").as("id_b"), col("pad").as("pad_b"))
    // the pad is aggregated, not dropped — otherwise column pruning strips
    // it from the shuffle and every partition is a few KB of bare longs,
    // below any meaningful skew threshold (d14's real payload is the
    // embedding vector, which rides the shuffle the same way)
    val agg = a.join(b, "cell").filter(col("id_a") < col("id_b"))
      .agg(count(lit(1)).as("n"), sum(length(col("pad_b"))).as("pad_bytes"))
    val n = agg.collect()(0).getLong(0)
    val finalPlan = agg.queryExecution.executedPlan match {
      case ad: AdaptiveSparkPlanExec => ad.executedPlan
      case p                         => p
    }
    (n, finalPlan)
  }

  test("OptimizeSkewedJoin fires on the d14-shaped cell self-join and preserves results") {
    var skewOnCount = -1L
    var skewOffCount = -2L
    withConf(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1k") {

      val (n, plan) = cellSelfJoinCount()
      skewOnCount = n
      val skewSmjs = deepCollect(plan) {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewSmjs.nonEmpty,
        s"expected OptimizeSkewedJoin to mark the cell join skew=true; final plan:\n$plan")
      val skewedReads = deepCollect(plan) {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewedReads.nonEmpty,
        s"expected a skew-split AQEShuffleRead under the cell join; final plan:\n$plan")

      // identical rows with the optimization off: skew handling must be a
      // pure re-distribution, never a semantic change
      withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
        val (off, offPlan) = cellSelfJoinCount()
        skewOffCount = off
        assert(deepCollect(offPlan) { case j: SortMergeJoinExec if j.isSkewJoin => j }.isEmpty)
      }
    }
    // hot cell: C(1500,2); tail: 62 cells x C(50,2)
    val expected = 1500L * 1499 / 2 + 62L * (50 * 49 / 2)
    assert(skewOnCount == expected && skewOffCount == expected,
      s"skew-on=$skewOnCount skew-off=$skewOffCount expected=$expected")
  }
}
