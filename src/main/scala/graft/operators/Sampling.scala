package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions._

/** Deterministic, id-keyed sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: re-runs, repartitions, or
  * retries select different rows, and the same document can land in both
  * train and test across pipeline versions. Hashing the stable id instead
  * makes every decision a pure function of the row: reproducible across
  * runs, engines (md5-derived — the DuckDB oracle verifies it), cluster
  * sizes, and time — the property a 100 TB training corpus needs so that
  * holdout contamination is structurally impossible.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform hash bucket in [0, 1) for an id column. */
  def hashFraction(id: Column): Column =
    pmod(md5_prefix_long(id.cast("string")), lit(Buckets)).cast("double") / Buckets.toDouble

  /** Keep ~`fraction` of rows, chosen by id hash — stable under re-runs and
    * repartitioning; row-local, no shuffle. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.filter(hashFraction(col(idCol)) < fraction)
  }

  /** Per-stratum deterministic sampling — the corpus-rebalancing op
    * (downsample over-represented languages/sources to a target mix): each
    * stratum keeps its own id-hash fraction; strata absent from the map keep
    * `defaultFraction`. Still a pure function of (id, stratum): row-local,
    * no shuffle, reproducible under any layout, and a row's membership
    * never flips when OTHER strata's fractions change (the hash line is per
    * id, the cut per stratum). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0,1], got $f"))
    val cut = fractions.foldLeft(lit(defaultFraction)) { case (e, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(e)
    }
    df.filter(hashFraction(col(idCol)) < cut)
  }

  /** Rebalance a corpus to a target stratum mix — the training-data
    * source-mixing op ("30% src0, 20% web, ..."): derive each stratum's keep
    * fraction from the OBSERVED counts so the sample hits the target
    * proportions while keeping 100% of the binding (most under-represented
    * relative to target) stratum and downsampling the rest. Strata absent
    * from `targets` are dropped. Targets must sum to 1.
    *
    * scale = min over strata of (n_s / t_s); keep_s = scale * t_s / n_s.
    *
    * Scale design: the per-stratum counts are a map-side-combined aggregate
    * whose result is stratum-sized (a dim, not the corpus); the fractions
    * derive from it IN-PLAN (one-row broadcast for the min, broadcast join
    * back) — no driver round-trip, no collect. Row membership is then the
    * same pure (id, stratum) hash decision as [[stratifiedSample]]:
    * deterministic across engines, re-runs, and layouts. */
  def rebalanceToTarget(df: DataFrame, idCol: String, stratumCol: String,
                        targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "rebalanceToTarget: targets must be non-empty")
    targets.foreach { case (k, t) =>
      require(t > 0.0, s"rebalanceToTarget: target for '$k' must be > 0, got $t") }
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      s"rebalanceToTarget: targets must sum to 1, got ${targets.map(_._2).sum}")
    val targetCol = targets.foldLeft(lit(null).cast("double")) {
      case (e, (k, t)) => when(col(stratumCol) === k, lit(t)).otherwise(e)
    }
    val inMix = df.withColumn("_target", targetCol).filter(col("_target").isNotNull)
    val counts = inMix
      .groupBy(col(stratumCol).as("_ms"), col("_target").as("_mt"))
      .agg(count(lit(1)).cast("double").as("_mn"))
    val scale = counts.agg(min(col("_mn") / col("_mt")).as("_scale"))
    val fractions = counts.crossJoin(broadcast(scale))
      .select(col("_ms"), (col("_scale") * col("_mt") / col("_mn")).as("_frac"))
    inMix.join(broadcast(fractions), col(stratumCol) === col("_ms"))
      .filter(hashFraction(col(idCol)) < col("_frac"))
      .drop("_ms", "_frac", "_target")
  }

  /** Assign each row to a named split by cumulative weight over the id-hash
    * line: weights ((train,0.8), (val,0.1), (test,0.1)) partition [0,1) into
    * contiguous ranges. Total weight must be 1. The same id always lands in
    * the same split — holdout membership survives any reprocessing. */
  def assignSplit(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                  as: String = "split"): DataFrame = {
    require(weights.nonEmpty, "assignSplit: weights must be non-empty")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"assignSplit: weights must sum to 1, got ${weights.map(_._2).sum}")
    val h = hashFraction(col(idCol))
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
    val expr = weights.zip(cuts).init.foldRight(lit(weights.last._1)) {
      case (((name, _), cut), elseExpr) => when(h < cut, name).otherwise(elseExpr)
    }
    df.withColumn(as, expr)
  }

  /** Deterministic weighted sampling WITHOUT replacement — the
    * quality-weighted corpus cut ("prefer wiki 8:1 over web crawl") done as
    * Efraimidis–Spirakis A-Res over the id-hash uniform instead of an RNG:
    * each row gets key = u^(1/w) with u = [[hashFraction]](id), and the
    * global top-k keys are the sample. Inclusion probability scales with
    * weight, membership is a pure function of (id, weight) — reproducible
    * across runs, engines, and cluster layouts, like every sampler here.
    * Rows with null or non-positive weight are excluded (they cannot be
    * drawn). Ties (id-hash collisions at equal weight) break by id.
    *
    * Scale design: the key is row-local (no shuffle to score), and top-k
    * is a TakeOrderedAndProject — per-partition heaps merged once, never a
    * global sort. Prefer power-of-two weights where exactness across
    * engines matters: 1/w is then a dyadic exponent and pow() agrees to
    * the last bit. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 0, s"weightedSample: k must be >= 0, got $k")
    val key = pow(hashFraction(col(idCol)), lit(1.0) / weight)
    df.filter(weight.isNotNull && weight > 0)
      .orderBy(key.desc, col(idCol))
      .limit(k)
  }

  /** Token-budget corpus selection: keep the highest-scoring documents
    * whose cumulative token count fits `budgetTokens` — the "best N tokens"
    * cut every pretraining data recipe ends with. Semantics are EXACTLY the
    * greedy prefix of the global (score desc, id asc) ordering: a row is
    * kept iff its running token sum in that ordering is <= the budget.
    *
    * Scale design — the naive form is an unpartitioned window (a global
    * sort-and-scan through ONE task; the shape PlanAuditSpec exists to
    * reject). Instead: (1) one aggregate builds a score-bucket histogram —
    * at most `granularity`+1 rows (scores are clamped to [0,1]) — which is
    * collected (bounded, metadata-scale; same posture as the skew hot-key
    * set); (2) the driver walks the histogram from the top to find the
    * BOUNDARY bucket and the budget remaining above it; (3) buckets above
    * the boundary are kept by a row-local filter (no shuffle at all), and
    * only the boundary bucket's rows — bounded by the score distribution,
    * not the corpus — pay a (bucketed, partitioned) window for the exact
    * within-bucket prefix. Ties are broken by id, so the cut is
    * deterministic and engine-reproducible down to the last document.
    *
    * Rows with a null score or null/negative token count are excluded up
    * front (they can be neither ordered nor budgeted). */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, budgetTokens: Long,
                        granularity: Int = 1000): DataFrame = {
    require(budgetTokens >= 0, s"tokenBudgetSelect: budget must be >= 0")
    require(granularity >= 1, s"tokenBudgetSelect: granularity must be >= 1")
    val clean = docs.filter(col(scoreCol).isNotNull && col(tokensCol).isNotNull &&
      col(tokensCol) >= 0)
    val bucket = floor(
      least(greatest(col(scoreCol), lit(0.0)), lit(1.0)) * granularity).cast("long")
    val hist = clean.groupBy(bucket.as("_b"))
      .agg(sum(col(tokensCol).cast("long")).as("_toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    // walk buckets from the best score down: everything above the boundary
    // fits wholesale; the boundary bucket gets the remaining budget
    var remaining = budgetTokens
    var boundary = Long.MinValue
    var boundaryBudget = 0L
    val it = hist.iterator
    var done = false
    while (it.hasNext && !done) {
      val (b, t) = it.next()
      if (t <= remaining) remaining -= t
      else { boundary = b; boundaryBudget = remaining; done = true }
    }
    if (!done) clean // whole corpus fits the budget
    else {
      val keptWhole = clean.filter(bucket > boundary)
      val wPrefix = org.apache.spark.sql.expressions.Window
        .partitionBy(bucket)
        .orderBy(col(scoreCol).desc, col(idCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val boundaryKept = clean.filter(bucket === boundary)
        .withColumn("_cum", sum(col(tokensCol).cast("long")).over(wPrefix))
        .filter(col("_cum") <= boundaryBudget)
        .drop("_cum")
      keptWhole.unionByName(boundaryKept)
    }
  }
}
