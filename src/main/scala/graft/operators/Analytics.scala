package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators over the events stream: funnel conversion and
  * cohort retention — the two queries every product-analytics warehouse
  * runs hourly, re-expressed as single-shuffle Spark plans.
  */
object Analytics {

  /** Ordered funnel conversion: stage k counts users whose first stage-1
    * event is followed by a stage-2 event within `horizonMicros`, whose
    * match is followed by a stage-3 event within the horizon of THAT
    * match, and so on (each step anchors at the previous step's matched
    * timestamp — the strict sequential funnel, not mere per-stage
    * presence).
    *
    * Scale design: ONE user-keyed shuffle. Per (user, stage) the
    * timestamps are collected as sorted epoch-micro arrays in a single
    * map-side-combined aggregate (funnel analysis assumes bounded per-user
    * event counts — the arrays are per-user-stage, never corpus-wide), and
    * the stage walk is a row-local `filter`/`array_min` chain over those
    * arrays. Output: (stage_no, stage, n_users), one row per stage,
    * n_users non-increasing. Epoch-micro longs keep the arithmetic
    * engine-exact. */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String], horizonMicros: Long): DataFrame =
    funnelImpl(events, userCol, segCol = None, typeCol, tsCol, stages, horizonMicros)

  /** [[funnel]] split by a per-user segment column (a cohort label, a
    * feature bucket): one funnel row-set per segment value, counted in the
    * same single user-keyed shuffle — the segment rides the per-user
    * grouping key, so segmentation adds NO extra pass. `segCol` must be
    * constant within a user (it joins the grouping key; a user with two
    * segment values would be walked once per value). */
  def funnelSegmented(events: DataFrame, userCol: String, segCol: String,
                      typeCol: String, tsCol: String,
                      stages: Seq[String], horizonMicros: Long): DataFrame =
    funnelImpl(events, userCol, Some(segCol), typeCol, tsCol, stages, horizonMicros)

  private def funnelImpl(events: DataFrame, userCol: String, segCol: Option[String],
                         typeCol: String, tsCol: String,
                         stages: Seq[String], horizonMicros: Long): DataFrame = {
    require(stages.size >= 2, s"funnel: need >= 2 stages, got ${stages.size}")
    require(horizonMicros > 0, s"funnel: horizonMicros must be positive")
    val keys = (userCol +: segCol.toSeq).map(col)
    val perUser = events
      .filter(col(typeCol).isInCollection(stages))
      .groupBy(keys: _*)
      .agg(stages.zipWithIndex.map { case (s, i) =>
        sort_array(collect_list(when(col(typeCol) === s,
          unix_micros(col(tsCol))))).as(s"_ts$i")
      }.head, stages.zipWithIndex.tail.map { case (s, i) =>
        sort_array(collect_list(when(col(typeCol) === s,
          unix_micros(col(tsCol))))).as(s"_ts$i")
      }: _*)
    // row-local stage walk: anchor(0) = first stage-0 event; anchor(k) =
    // earliest stage-k event in [anchor(k-1), anchor(k-1) + horizon].
    // Each anchor is PROJECTED as its own column and the next stage's
    // filter lambda references that attribute — never the previous
    // anchor's expression tree. HOF lambdas defeat CSE, so inlining
    // anchor k-1 (referenced twice per lambda) re-evaluates it per
    // element of _ts(k): O((2m)^k) work per row. The multi-reference of
    // a non-cheap projected column also blocks CollapseProject from
    // undoing the materialization.
    val withAnchors = stages.indices.foldLeft(perUser) { (df, i) =>
      val a =
        if (i == 0) array_min(col("_ts0"))
        else {
          val prev = col(s"_a${i - 1}")
          array_min(filter(col(s"_ts$i"),
            t => t >= prev && t <= prev + horizonMicros))
        }
      df.withColumn(s"_a$i", a)
    }
    val reached = withAnchors.select(
      (segCol.map(col).toSeq ++ stages.indices.map(i =>
        col(s"_a$i").isNotNull.cast("long").as(s"_r$i"))): _*)
    val sums = sum(col("_r0")).as("_n0") +:
      stages.indices.tail.map(i => sum(col(s"_r$i")).as(s"_n$i"))
    // segmented: map-side-combined per-segment sums; global: one scalar row
    val counts = segCol match {
      case Some(sc) => reached.groupBy(col(sc)).agg(sums.head, sums.tail: _*)
      case None     => reached.agg(sums.head, sums.tail: _*)
    }
    val rows = array(stages.zipWithIndex.map { case (s, i) => struct(
      lit(i + 1).as("stage_no"), lit(s).as("stage"),
      coalesce(col(s"_n$i"), lit(0L)).as("n_users"))
    }: _*)
    counts.select((segCol.map(col).toSeq :+ explode(rows).as("_s")): _*)
      .select((segCol.map(col).toSeq :+ col("_s.*")): _*)
      .orderBy((segCol.map(col).toSeq :+ col("stage_no")): _*)
  }

  /** Cohort retention: users are cohorted by the day-bucket of their FIRST
    * event; cell (cohort_day, day_offset) counts distinct cohort members
    * active `day_offset` bucket-days later. `bucketDays` widens the bucket
    * (7 = weekly cohorts).
    *
    * Scale design: one user-keyed aggregate for first-seen, one distinct
    * over (user, bucket), one user-keyed join to attach the cohort, one
    * map-side-combined count per (cohort, offset) — every shuffle is keyed,
    * nothing collects. Date arithmetic stays in whole bucket indexes
    * (epoch-day / bucketDays), so both engines bucket identically. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, s"cohortRetention: bucketDays must be >= 1")
    val bucket = floor(unix_date(to_date(col(tsCol))) / bucketDays).cast("long")
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(bucket).as("_cohort"))
    val active = events.select(col(userCol), bucket.as("_bucket")).distinct()
    active.join(firstSeen, userCol)
      .groupBy(col("_cohort").as("cohort_bucket"),
        (col("_bucket") - col("_cohort")).as("bucket_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("cohort_bucket"), col("bucket_offset"))
  }

  /** Gap-based sessionization as row-level ordinal numbering (the
    * gaps-and-islands form): number each user's events into sessions,
    * starting a new session whenever the gap to the previous event exceeds
    * `gapMicros` (the classic 30-minute web-session cut). Appends a
    * 1-based `session_no` column; (userCol, session_no) is the session
    * key for any downstream per-session aggregate.
    *
    * Contrast with `session_window` (q33 batch, [[graft.streaming.Streams.sessionize]]
    * streaming), which COLLAPSES events into session rows: this keeps
    * every event and stamps it with its session ordinal — the shape
    * per-session features, "nth session" analyses, and session-keyed
    * joins need.
    *
    * Scale design: ONE user-keyed shuffle — the boundary lag and the
    * running boundary count are windows over the same (user, ts)
    * partitioning, and a following groupBy on (user, session_no) rides
    * that partitioning too (user alone already co-locates it), so a full
    * sessionize-then-summarize plan shuffles the event fact exactly once.
    *
    * Determinism under timestamp ties: the boundary flag is computed from
    * timestamp VALUES (tied rows see gap 0 whichever of them sorts
    * first), and the running count uses the default RANGE frame, so all
    * peer rows share one cumulative value — both engines agree however
    * they break the tie. Epoch-micro longs keep the gap arithmetic
    * engine-exact. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"sessionize: gapMicros must be > 0, got $gapMicros")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(wOrd)
    val isNew = when(prev.isNull || us - prev > gapMicros, 1L).otherwise(0L)
    events.withColumn("session_no", sum(isNew).over(wOrd))
  }

  /** 2-D skyline (Pareto frontier): rows not dominated by any other row,
    * where domination means `maxCol` >= AND `minCol` <= with at least one
    * strict. The classic multi-criteria cut ("no one is both cheaper and
    * better") — for a training-data pipeline, the quality-vs-cost frontier
    * over sources or shards. Duplicated frontier points all survive
    * (neither dominates the other).
    *
    * Scale design: sort-filter skyline in two phases. Phase 1 prunes
    * PARTITION-LOCALLY (window keyed on `spark_partition_id()` — fully
    * parallel, no shuffle): any row dominated within its partition is
    * dominated globally, so local pruning preserves the frontier while
    * shrinking the candidate set to at most P × |skyline-per-partition|.
    * Phase 2 runs the exact global sort-filter over those survivors; its
    * single-ordered window is candidate-sized, not input-sized (the prune
    * is what makes a global-order step admissible at scale — same posture
    * as a TakeOrdered). Both phases are one window + one filter: a row
    * survives iff its `minCol` beats the running min over STRICTLY greater
    * `maxCol` (RANGE frame `(+1, ∞)` — integer metrics make +1 exactly
    * "strictly greater") and equals the min within its `maxCol` tie-group.
    * Both columns must be integral for the range frame to be exact. */
  def skyline2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    def frontier(in: DataFrame, part: Seq[Column]): DataFrame = {
      val wGt = org.apache.spark.sql.expressions.Window
        .partitionBy(part: _*).orderBy(col(maxCol))
        .rangeBetween(1L, org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val wEq = org.apache.spark.sql.expressions.Window
        .partitionBy((part :+ col(maxCol)): _*)
      in.withColumn("_dom", min(col(minCol)).over(wGt))
        .withColumn("_tie", min(col(minCol)).over(wEq))
        .filter((col("_dom").isNull || col(minCol) < col("_dom")) &&
          col(minCol) === col("_tie"))
        .drop("_dom", "_tie")
    }
    val pruned = frontier(df.withColumn("_pid", spark_partition_id()),
      Seq(col("_pid"))).drop("_pid")
    frontier(pruned, Seq.empty)
  }

  /** Sequential throttle (rate limit): per key, keep an event iff it is at
    * least `minGapMicros` after the LAST KEPT event — the anchor advances
    * only on kept rows, which is what distinguishes a true throttle from
    * gap-based sessionization ([[sessionize]] anchors at the previous RAW
    * event; the two disagree on any burst longer than one gap). The
    * semantics every alerting / notification / retry pipeline wants:
    * "at most one per key per interval, measured from the last one sent".
    *
    * Scale design: the fold is inherently sequential PER KEY but
    * embarrassingly parallel ACROSS keys, so the plan is one key-hashed
    * repartition + an in-partition sort on (key, ts, tiebreak) + a
    * STREAMING `mapPartitions` fold — O(1) memory per partition (state is
    * one `(key, lastKeptTs)` pair; no per-key buffer is ever
    * materialized, unlike a collect_list approach), one shuffle total.
    * `tieCol` must make (key, ts, tieCol) a total order so both engines
    * fold identically. */
  def throttle(events: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, minGapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "throttle: need at least one key column")
    require(minGapMicros > 0, s"throttle: minGapMicros must be > 0")
    val withUs = events.withColumn("_us", unix_micros(col(tsCol)))
    val sorted = withUs
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols.map(col) :+ col("_us") :+ col(tieCol)): _*)
    val schema = sorted.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val usIdx = schema.fieldIndex("_us")
    val out = sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var lastKept = Long.MinValue
      it.filter { row =>
        val k = keyIdx.map(row.get)
        if (k != curKey) { curKey = k; lastKept = Long.MinValue }
        val us = row.getLong(usIdx)
        val keep = lastKept == Long.MinValue || us - lastKept >= minGapMicros
        if (keep) lastKept = us
        keep
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out.drop("_us")
  }
}
