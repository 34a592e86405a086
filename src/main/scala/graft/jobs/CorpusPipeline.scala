package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** End-to-end training-corpus cleaning — the composition the individual
  * dedup and text-analysis operators exist for, as one declarative plan:
  *
  *   language-ID -> quality gate -> exact dedup (canonical min id per
  *   identical text) -> MinHash-LSH near-dup removal (drop the
  *   non-canonical side of each detected pair) -> deterministic
  *   train/val/test assignment.
  *
  * Shuffle inventory at scale: one hash partition for the exact-dedup
  * window, the LSH (band, bucket) equi-join with its hot-bucket cap, one
  * left-anti join on the drop set, and nothing else — language-ID, quality,
  * and split assignment are row-local codegen'd kernels.
  */
object CorpusPipeline {

  /** `clusterDedup = false` drops the `id_b` side of each detected pair —
    * one anti join, the oracle-checked default. `clusterDedup = true` runs
    * connected components over the pair graph first and keeps one canonical
    * doc (min id) per component — catches transitive duplicates whose
    * direct pair was pruned by banding, at the cost of the iterative
    * label-propagation rounds (see [[Dedup.connectedComponents]]).
    *
    * `benchmark` (opt-in) adds the decontamination gate after near-dup
    * removal: documents whose n-gram overlap with the benchmark set reaches
    * `contaminationThreshold` are dropped before split assignment
    * ([[graft.operators.Decontaminate]] — the benchmark side broadcasts).
    *
    * `mixTargets` (opt-in) rebalances the surviving corpus to a target
    * stratum mix over `mixStratumCol` before split assignment
    * ([[Sampling.rebalanceToTarget]] — keep fractions derived in-plan from
    * the post-dedup counts, so the mix reflects what actually survived). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.7, jaccardThreshold: Double = 0.5,
            splits: Seq[(String, Double)] =
              Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
            clusterDedup: Boolean = false,
            benchmark: Option[DataFrame] = None,
            contaminationThreshold: Double = 0.5,
            contaminationNgram: Int = 3,
            mixTargets: Option[Seq[(String, Double)]] = None,
            mixStratumCol: String = "source"): DataFrame = {
    val tagged = TextAnalysis.qualitySignals(docs, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
    val gated = tagged.filter(
      col("lang_pred") =!= "und" && col("quality_score") >= minQuality)
    // materialized once: exactKept feeds BOTH the LSH near-dup leg and the
    // final anti-join — without this the gate kernels and the exact-dedup
    // window (a full shuffle on md5(text)) run twice. Stored on executors
    // (memory-and-disk), same trade as the LSH signature cache.
    val exactKept = gated
      .withColumn("_keep", min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col(idCol) === col("_keep")).drop("_keep")
      .localCheckpoint(false)
    // banding AUTOCONFIGURED from the S-curve sweep at the pipeline's
    // own threshold (the d03/d12 discipline — a blind constant here
    // silently starves near-threshold recall; (8,4) at the default 0.5)
    val (nb, nr) = Dedup.selectLshSplit(docs.sparkSession,
      threshold = jaccardThreshold, maxSignature = 32)
    val nearDupPairs = Dedup.minhashLsh(exactKept, idCol, textCol,
      k = 5, bands = nb, rowsPerBand = nr, threshold = jaccardThreshold)
    val keptPlan =
      if (clusterDedup)
        Dedup.dropDuplicateClusterMembers(exactKept, idCol, nearDupPairs)
      else {
        val dropIds = nearDupPairs.select(col("id_b").as(idCol)).distinct()
        exactKept.join(dropIds, Seq(idCol), "left_anti")
      }
    // with a benchmark, `kept` feeds BOTH the contamination branch and the
    // final anti-join — materialize it once (same trade as exactKept above)
    // so the near-dup join + drop-set anti-join do not run twice
    val kept = if (benchmark.isDefined) keptPlan.localCheckpoint(false) else keptPlan
    val decontaminated = benchmark match {
      case None => kept
      case Some(bench) =>
        val contaminatedIds = graft.operators.Decontaminate
          .contamination(kept, bench, idCol, textCol,
            n = contaminationNgram, threshold = contaminationThreshold)
          .filter(col("contaminated") === 1)
          .select(col(idCol))
        kept.join(contaminatedIds, Seq(idCol), "left_anti")
    }
    val rebalanced = mixTargets match {
      case None => decontaminated
      case Some(targets) =>
        Sampling.rebalanceToTarget(decontaminated, idCol, mixStratumCol, targets)
    }
    Sampling.assignSplit(rebalanced, idCol, splits)
  }

  /** Drop-provenance audit — [[clean]]'s verdict for EVERY input document
    * with the FIRST failing rule named (precedence: language gate →
    * quality gate → exact duplicate → near duplicate), instead of
    * silently returning only survivors. The telemetry every production
    * cleaning pipeline keeps: "why did my corpus shrink 40%" is
    * answerable only if each drop carries its reason, and rule-level drop
    * rates are the pipeline's primary health metric.
    *
    * Same shuffle inventory as [[clean]] (gate kernels row-local, one
    * md5-keyed window, the LSH leg, one distinct) plus two id-keyed LEFT
    * joins that attach the exact-kept and near-drop verdicts back to the
    * full input — at scale both sides are id-hashed, and the verdict
    * frames carry one column. */
  def dropProvenance(docs: DataFrame, idCol: String, textCol: String,
                     minQuality: Double = 0.7,
                     jaccardThreshold: Double = 0.5): DataFrame = {
    // materialized once: `tagged` feeds the gate -> exact-dedup chain AND
    // the final verdict projection — without this the langid + quality
    // kernels (the dominant row-local cost) run twice per audit (guide §5)
    val tagged = TextAnalysis.qualitySignals(docs, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .localCheckpoint(false)
    val gated = tagged.filter(
      col("lang_pred") =!= "und" && col("quality_score") >= minQuality)
    val exactKept = gated
      .withColumn("_keep", min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .filter(col(idCol) === col("_keep")).drop("_keep")
      .localCheckpoint(false) // feeds the LSH leg AND the verdict join
    // same sweep-selected banding as [[clean]] — the two legs must agree
    // on the pair set or the provenance verdicts drift from the survivors
    val (nb, nr) = Dedup.selectLshSplit(docs.sparkSession,
      threshold = jaccardThreshold, maxSignature = 32)
    val nearDrop = Dedup.minhashLsh(exactKept, idCol, textCol,
        k = 5, bands = nb, rowsPerBand = nr, threshold = jaccardThreshold)
      .select(col("id_b").as("_nd")).distinct()
    val exactIds = exactKept.select(col(idCol).as("_ek"))
    tagged
      .join(exactIds, col(idCol) === col("_ek"), "left")
      .join(nearDrop, col(idCol) === col("_nd"), "left")
      .select(col(idCol),
        when(col("lang_pred") === "und", "lang")
          .when(col("quality_score") < minQuality, "quality")
          .when(col("_ek").isNull, "exact_dup")
          .when(col("_nd").isNotNull, "near_dup")
          .otherwise("kept").as("reason"))
      .withColumn("keep", col("reason") === "kept")
  }
}
