package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline. One
  *    scan, row-local cosine, TakeOrderedAndProject (no global sort
  *    materialization).
  *  - `lshTopK`: random-hyperplane LSH — the scale path. Hyperplanes are
  *    derived deterministically from md5 so any engine reproduces the same
  *    buckets; the probe only scans the query's bucket.
  */
object Similarity {

  /** Matryoshka-style prefix-rerank ANN (Kusupati et al. 2022): score the
    * corpus on the FIRST `prefixDim` dimensions only (MRL-trained
    * embeddings front-load information, so the prefix preserves ranking),
    * keep `candidates` coarse winners, then rerank exactly on the full
    * vector. The cheap stage reads prefixDim/dim of the vector bytes per
    * row (with vectors stored dim-major/chunked, the scan itself shrinks);
    * the exact stage touches only the BOUNDED candidate set.
    *
    * Plan shape: stage 1 is one scan + row-local prefix cosine +
    * `TakeOrderedAndProject(candidates)`; stage 2 joins the candidate ids
    * back BROADCAST (bounded by construction) and ends in
    * `TakeOrderedAndProject(k)`. No shuffle anywhere.
    *
    * Both stages order by (rounded score DESC, id) — total orders, so the
    * candidate CUT and the final ranking are engine-deterministic. */
  def prefixRerankTopK(emb: DataFrame, idCol: String, vecCol: String,
                       queryId: Long, k: Int, prefixDim: Int,
                       candidates: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    require(candidates >= k, s"need candidates >= k, got $candidates < $k")
    val pvec = slice(col(vecCol), 1, prefixDim)
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qfull"), slice(col(vecCol), 1, prefixDim).as("_qpre"))
    val coarse = emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId && l2_norm(pvec) > 0)
      .withColumn("_pcos", round(cosine(pvec, col("_qpre")), 6))
      .orderBy(col("_pcos").desc, col(idCol).asc)
      .limit(candidates)
      .select(col(idCol).as("_cid"))
    emb.join(broadcast(coarse), col(idCol) === col("_cid"))
      .crossJoin(broadcast(q))
      .withColumn("cosine", round(cosine(col(vecCol), col("_qfull")), 6))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Scalar int8 quantization (SQ8) ANN: each vector is compressed to one
    * signed byte per dimension with a per-vector symmetric scale
    * (`c_i = floor(v_i * 127 / maxabs)`, all-zero codes for the zero
    * vector), and candidates are ranked by the INTEGER dot product of the
    * code arrays — the 4× memory compression every production vector store
    * applies before anything fancier (FAISS `SQ8`, Lucene scalar
    * quantization). Top `rerank` code-space winners are re-scored with the
    * exact float cosine, and the final k come from that exact ordering —
    * the standard quantize-then-rerank contract: compression decides the
    * CANDIDATES, full precision decides the ANSWER.
    *
    * Scale design: codes are row-local arithmetic (at scale they'd be
    * precomputed into a byte-array column — 1/4 the scan bytes; here they
    * fuse into the scan). Stage 1 is one corpus scan ending in
    * `TakeOrderedAndProject(rerank)` (per-partition heaps, no global
    * sort); stage 2 re-reads only the BOUNDED candidate set via broadcast
    * semi-join and ends in `TakeOrderedAndProject(k)`. No shuffle in
    * either stage. Integer dots and floor-based codes are engine-exact, so
    * the candidate CUT is deterministic (ties broken by id), and the float
    * rerank rounds before ordering — the whole output is
    * oracle-reproducible bit-for-bit. */
  def sq8TopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"sq8TopK: need rerank >= k, got $rerank < $k")
    def codes(vec: Column): Column = {
      val dv = vec.cast("array<double>")
      val maxabs = array_max(transform(dv, x => abs(x)))
      when(maxabs === 0.0, transform(dv, _ => lit(0L)))
        .otherwise(transform(dv, x => floor(x * lit(127.0) / maxabs)))
    }
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), codes(col(vecCol)).as("_qcodes"))
    val coarse = emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .withColumn("_qdot", aggregate(
        zip_with(codes(col(vecCol)), col("_qcodes"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .orderBy(col("_qdot").desc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol).as("_cid"), col("_qdot"))
    emb.join(broadcast(coarse), col(idCol) === col("_cid"))
      .crossJoin(broadcast(q.select(col("_qvec"))))
      .withColumn("cosine", round(cosine(col(vecCol), col("_qvec")), 6))
      .select(col(idCol), col("_qdot").as("qdot"), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  private final case class MmrPick(rank: Int, vec_id: Long, rel_m: Long, mmr_m: Long)

  /** Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein
    * 1998) — the de-duplicating rerank retrieval pipelines bolt onto ANN:
    * after relevance proposes `candN` candidates, greedily pick k items by
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` so near-duplicate hits
    * don't crowd the result list.
    *
    * Scale design: the DATA-SCALE stage is stage 1 only — the corpus-wide
    * relevance top-candN (one scan, `TakeOrderedAndProject`). Everything
    * after runs on the BOUNDED candidate set: the pairwise-similarity
    * self-join is candN² with the right side broadcast, and the greedy
    * fold (inherently sequential — each pick changes every remaining
    * score) reads candidates + pairs as a bounded CONTROL read (≤ candN +
    * candN²/2 rows, the codebook-trainer posture — never data-scale).
    *
    * Engine parity: scores stay in exact integer arithmetic — relevance
    * and pair cosines quantize to micro-units (`floor(cos·10⁶)` longs)
    * and λ to thousandths, so `mmr_m = λₘ·rel_m − (1000−λₘ)·max_sim_m`
    * has no float comparison anywhere and the selection order is
    * bit-reproducible (ties by id). The oracle unrolls the k greedy steps
    * as chained CTEs over the same integers. */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, candN: Int, lambdaMilli: Int): DataFrame = {
    require(k >= 1 && k <= candN, s"mmrRerank: need 1 <= k <= candN, got k=$k candN=$candN")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      s"mmrRerank: lambdaMilli must be in [0, 1000], got $lambdaMilli")
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("_qvec"))
    val cand = emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol).as("cid"),
        floor(cosine(col(vecCol).cast("array<double>"), col("_qvec")) * lit(1e6))
          .cast("long").as("rel_m"),
        col(vecCol).cast("array<double>").as("cvec"))
      .orderBy(col("rel_m").desc, col("cid").asc)
      .limit(candN)
      .localCheckpoint() // reused thrice below; bounded (candN rows)
    val x = cand.select(col("cid").as("xid"), col("cvec").as("xv"))
    val y = cand.select(col("cid").as("yid"), col("cvec").as("yv"))
    val pairs = x.join(broadcast(y), col("xid") < col("yid"))
      .select(col("xid"), col("yid"),
        floor(cosine(col("xv"), col("yv")) * lit(1e6)).cast("long").as("sim_m"))
    // bounded control reads — candN and candN·(candN−1)/2 rows
    val cs = cand.select(col("cid"), col("rel_m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sim = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def simOf(a: Long, b: Long): Long = sim((math.min(a, b), math.max(a, b)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    val remaining = scala.collection.mutable.LinkedHashMap(cs: _*)
    for (rank <- 1 to math.min(k, cs.length)) {
      val (bestId, bestRel, bestScore) = remaining.iterator.map { case (id, rel) =>
        val maxSim = if (selected.isEmpty) 0L
          else selected.iterator.map(s => simOf(id, s.vec_id)).max
        (id, rel, lambdaMilli * rel - (1000L - lambdaMilli) * maxSim)
      }.minBy { case (id, _, score) => (-score, id) }
      selected += MmrPick(rank, bestId, bestRel, bestScore)
      remaining.remove(bestId)
    }
    emb.sparkSession.createDataFrame(selected.toSeq)
  }

  /** Exact top-k by cosine against one query vector. `TakeOrderedAndProject`
    * keeps per-partition heaps of k — no full sort, no driver pressure. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"))
    emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .withColumn("cosine", round(cosine(col(vecCol), col("_qvec")), 6))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Brute-force batch top-k: exact cosine top-k over `corpus` for EVERY
    * query row — the ground truth an ANN index is measured against. The
    * query panel broadcasts (it is a bounded evaluation sample, not a
    * data-scale side); the corpus streams past it once and the bounded-heap
    * `top_k_by` keeps k ids per (query, partition) through the shuffle, so
    * cost is O(|corpus| x |queries|) scoring with k-row shuffle volume.
    * Use a sampled query panel: recall evaluation needs hundreds of
    * queries, not the full left side. */
  def bruteForceJoinTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                         vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("id_l"),
      col(vecCol).cast("array<double>").as("_lv"))
    val c = corpus.select(col(idCol).as("id_r"),
      col(vecCol).cast("array<double>").as("_rv"))
    c.crossJoin(broadcast(q))
      .filter(col("id_l") =!= col("id_r"))
      .select(col("id_l"), col("id_r"),
        round(cosine(col("_rv"), col("_lv")), 6).as("cosine"))
      .groupBy(col("id_l"))
      .agg(graft.Functions.top_k_by(col("id_r"), col("cosine"), col("id_r"), k).as("_topk"))
      .select(col("id_l"), posexplode(col("_topk")))
      .withColumn("rank", (col("pos") + 1).cast("int"))
      .select(col("id_l"), col("rank"), col("col").as("id_r"))
  }

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * (md5_int48(p + "_" + d) mod 1000)/1000 - 0.5 — expressible in any
    * engine with md5 (the s02 oracle replays it in SQL), precomputed
    * driver-side into the broadcast plane matrix. */
  def md5PlaneScala(p: Int, d: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 12)
    val h = java.lang.Long.parseLong(hex, 16)
    (h % 1000L).toDouble / 1000.0 - 0.5
  }

  /** Sign-bit LSH bucket id for a vector: bit p = (dot(vec, plane_p) >= 0).
    * Row-local over a BROADCAST plane matrix — the plan carries one node
    * and a broadcast id, so planes x dim can grow to production size
    * (16+ planes over 1k+ dims) without plan/codegen blowup, the same
    * posture as [[broadcastCodebook]]. Planes remain md5-derived, so any
    * engine reproduces the buckets. The bucket id is one long of sign
    * bits, so numPlanes is capped at 64 — plane p uses bit p (p in
    * 0..63; plane 64 would shift `1L << 64`, which wraps mod 64 and
    * silently collides with plane 0's bit). */
  def lshBucket(df: DataFrame, vec: Column, numPlanes: Int, dim: Int): Column = {
    require(numPlanes >= 1 && numPlanes <= 64,
      s"lshBucket: numPlanes must be in 1..64 (bucket is one long of sign bits" +
        s" and `1L << p` wraps mod 64 from the 65th plane on), got $numPlanes")
    val planes: Array[Array[Double]] = Array.tabulate(numPlanes, dim)(md5PlaneScala)
    hyperplane_bucket(vec, df.sparkSession.sparkContext.broadcast(planes))
  }

  /** Scale-adaptive list count: nlist = floor(sqrt(N)), the standard IVF
    * sizing — cells stay ~sqrt(N) vectors, so a within-cell self-join does
    * ~N^1.5 pair work instead of the ~N^2 a fixed nlist degrades to, and
    * the codebook stays far below data scale (10^4 lists at 10^8 vectors). */
  def adaptiveNlist(n: Long): Int =
    math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong).toInt

  /** Broadcast codebook of [[adaptiveNlist]] centroids SAMPLED from the
    * corpus: the nlist vectors first in md5(id) order — a deterministic
    * pseudo-random sample any engine reproduces (the DuckDB oracle runs
    * the same ORDER BY md5 LIMIT). Sampling FROM the data is load-bearing,
    * not a convenience: synthetic (hash-derived) centroids ignore the data
    * distribution, so clustered corpora collapse onto few cells — measured
    * on the 10x scaling replica, md5-random centroids put 2354 of 20k
    * vectors in one cell (11.2M within-cell pairs) where the sampled
    * codebook's max cell is 504 (2.05M pairs, 1.45x the uniform ideal).
    * Centroids are ordered by id, so cell ids are stable under resampling
    * of the same corpus. Cost: one count + one top-nlist collect — both
    * bounded control reads (~sqrt(N) rows), the "codebook rows are always
    * small enough to collect" contract of [[broadcastCodebook]]. */
  def derivedCodebook(emb: DataFrame, idCol: String, vecCol: String)
      : org.apache.spark.broadcast.Broadcast[Array[Array[Double]]] = {
    val nlist = adaptiveNlist(emb.count())
    // id keeps its own type (a long cast would null string ids); centroid
    // order = id order, so cell ids are stable under resampling
    val sampled = emb
      .select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .orderBy(md5(col("_id").cast("string")), col("_id"))
      .limit(nlist)
      .orderBy(col("_id"))
      .collect()
      .map(_.getSeq[Double](1).toArray)
    emb.sparkSession.sparkContext.broadcast(sampled)
  }

  /** Batch ANN JOIN — every LEFT vector finds its top-k RIGHT neighbors
    * among vectors sharing its IVF cell: the two-corpus alignment shape
    * (embedding dedup across corpora, retrieval-pair mining) where the
    * single-query entry points ([[bruteForceTopK]], [[ivfTopK]]) would need
    * one pass per query. Both sides assign row-local to a literal codebook
    * (argmax cosine, codegen'd, shuffle-free); candidates come from ONE
    * equi-join on the cell id — never a cross join, cell skew handled by
    * AQE — and the per-left top-k is the bounded-heap aggregate (k rows per
    * (left, partition) cross the shuffle, no window sort). Recall follows
    * IVF-at-nprobe=1: neighbors in adjacent cells are missed, the standard
    * trade. Output: (id_l, rank, id_r, cosine), rank 1-based by
    * (cosine DESC, id_r ASC). */
  def annJoin(left: DataFrame, right: DataFrame, idCol: String, vecCol: String,
              corpus: DataFrame, centroidIds: Seq[Long], k: Int): DataFrame = {
    require(centroidIds.nonEmpty, "annJoin: centroidIds must be non-empty")
    annJoinWithCodebook(left, right, idCol, vecCol,
      broadcastCodebook(corpus, idCol, vecCol, centroidIds, "annJoin"), k)
  }

  /** [[annJoin]] with scale-adaptive parameterization: nlist =
    * floor(sqrt(|corpus|)) corpus-sampled centroids
    * ([[derivedCodebook]]), so cell population stays ~sqrt(N) and the
    * cell equi-join's pair work grows ~N^1.5 instead of N^2 as the
    * corpus grows — no pinned nlist to outgrow. */
  def annJoinDerived(left: DataFrame, right: DataFrame, idCol: String,
                     vecCol: String, corpus: DataFrame, k: Int): DataFrame =
    annJoinWithCodebook(left, right, idCol, vecCol,
      derivedCodebook(corpus, idCol, vecCol), k)

  /** [[annJoinDerived]] with MULTIPROBE queries: each query explodes to
    * the `nprobe` cells whose centroids score highest against it (ties at
    * the probe threshold include extra cells, deterministically in both
    * engines — the ivfTopK convention), while corpus rows keep their one
    * home cell, so every (query, candidate) pair still meets AT MOST ONCE
    * and no dedup pass exists. Candidate volume scales by nprobe/nlist of
    * the corpus per query — the recall/cost dial the s14 harness measures:
    * single-probe misses neighbors whose home cell is the query's
    * second-best, which is exactly what probing 2 cells recovers. */
  def annJoinDerivedMultiprobe(left: DataFrame, right: DataFrame, idCol: String,
                               vecCol: String, corpus: DataFrame, k: Int,
                               nprobe: Int): DataFrame = {
    val codebook = derivedCodebook(corpus, idCol, vecCol)
    require(nprobe >= 1 && nprobe <= codebook.value.length,
      s"annJoinDerivedMultiprobe: nprobe must be in 1..${codebook.value.length}, got $nprobe")
    topKFromScored(multiprobeScored(left, right, idCol, vecCol, codebook, nprobe), k)
  }

  /** The multiprobe candidate frame shared by [[annJoinDerivedMultiprobe]]
    * and [[annAutotune]]: queries explode to their `nprobe` best cells
    * (ties at the probe threshold included, the ivfTopK convention), corpus
    * rows keep one home cell, ONE cell equi-join scores the candidates —
    * each (query, candidate) pair meets at most once. */
  private def multiprobeScored(left: DataFrame, right: DataFrame,
      idCol: String, vecCol: String,
      codebook: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      nprobe: Int): DataFrame = {
    val l = left.select(col(idCol).as("id_l"), col(vecCol).as("_lvec"))
      .withColumn("_qcos", cell_scores(col("_lvec"), codebook))
      .withColumn("_thr",
        element_at(sort_array(col("_qcos"), asc = false), nprobe))
      .withColumn("_cell", explode(filter(
        transform(sequence(lit(0), size(col("_qcos")) - 1),
          i => when(element_at(col("_qcos"), i + 1) >= col("_thr"), i)),
        x => x.isNotNull)))
      .drop("_qcos", "_thr")
    val r = right.select(col(idCol).as("id_r"), col(vecCol).as("_rvec"))
      .withColumn("_cell", cell_assign(col("_rvec"), codebook))
    l.join(r, "_cell")
      .filter(col("id_l") =!= col("id_r"))
      .withColumn("cosine", round(cosine(col("_lvec"), col("_rvec")), 6))
      .select(col("id_l"), col("id_r"), col("cosine"))
  }

  private def topKFromScored(scored: DataFrame, k: Int): DataFrame =
    Windows.topKPerGroup(
        scored.withColumn("_payload", struct(col("id_r"), col("cosine"))),
        Seq("id_l"), "_payload", "cosine", "id_r", k)
      .select(col("id_l"), col("rank"),
        col("_payload.id_r").as("id_r"), col("_payload.cosine").as("cosine"))

  /** Recall-targeted ANN SELF-CONFIGURATION — the tuning loop every index
    * deployment runs before pinning nprobe: sweep `nprobes` over the
    * s14/s15 recall harness (multiprobe ANN vs exact ground truth on a
    * bounded query panel) and SELECT the cheapest configuration meeting
    * `targetRecallMicro` (recall in micro-units, 10^6 = 1.0). One summary
    * row per swept nprobe: candidate-pair cost, truth hits, recall, and
    * `chosen` pinned on exactly one row — the min-cost config that meets
    * the target, or the max-recall config (ties to the smaller nprobe)
    * when none does, so the sweep always returns an actionable pick.
    *
    * Scale design: the codebook derives ONCE for the whole sweep (one
    * bounded control read, shared broadcast); ground truth computes ONCE
    * (|corpus| x |panel| scoring through the bounded-heap top-k, never
    * corpus x corpus) and is localCheckpointed at panel x k rows; each
    * probe's candidate frame materializes once and feeds both its cost
    * count and its top-k (panel x nprobe x sqrt(N) rows — panel-bounded,
    * never data-scale). Recall stays in exact integer arithmetic
    * (`(hits * 10^6) DIV truth_rows`) and the selection key is a
    * struct-ordered min — no float comparison anywhere, so the pick is
    * bit-reproducible in any engine (the oracle replays the same sweep
    * with a row_number over the same integer keys). */
  def annAutotune(queries: DataFrame, corpusR: DataFrame, idCol: String,
                  vecCol: String, corpus: DataFrame, k: Int,
                  nprobes: Seq[Int], targetRecallMicro: Long): DataFrame = {
    require(nprobes.nonEmpty && nprobes.distinct == nprobes,
      s"annAutotune: nprobes must be non-empty and distinct, got $nprobes")
    require(targetRecallMicro >= 0 && targetRecallMicro <= 1000000L,
      s"annAutotune: targetRecallMicro must be in [0, 10^6], got $targetRecallMicro")
    val codebook = derivedCodebook(corpus, idCol, vecCol)
    require(nprobes.forall(np => np >= 1 && np <= codebook.value.length),
      s"annAutotune: every nprobe must be in 1..${codebook.value.length}, got $nprobes")
    // ground truth once for the whole sweep — bounded (panel x k rows)
    val truth = bruteForceJoinTopK(queries, corpusR, idCol, vecCol, k)
      .select(col("id_l"), col("id_r")).localCheckpoint()
    val nTruth = truth.groupBy().agg(count(lit(1)).as("n_truth"))
    val perProbe = nprobes.map { np =>
      val scored = multiprobeScored(queries, corpusR, idCol, vecCol, codebook, np)
        .localCheckpoint() // one pass feeds both the cost count and the top-k
      val ann = topKFromScored(scored, k).select(col("id_l"), col("id_r"))
      val cost = scored.groupBy().agg(count(lit(1)).as("n_pairs"))
      val hits = truth.join(ann, Seq("id_l", "id_r"))
        .groupBy().agg(count(lit(1)).as("n_hits"))
      cost.crossJoin(broadcast(hits))
        .select(lit(np).as("nprobe"), col("n_pairs"), col("n_hits"))
    }
    val summary = perProbe.reduce(_.unionByName(_))
      .crossJoin(broadcast(nTruth))
      // an empty truth panel pins recall to 0 rather than a null DIV-by-
      // zero (which would null the selection key on every row and leave
      // NO chosen config); the fallback then picks the smallest nprobe
      .withColumn("recall_micro", expr(
        "CAST(CASE WHEN n_truth = 0 THEN 0 " +
          "ELSE (n_hits * 1000000) DIV n_truth END AS BIGINT)"))
    // selection key: meeting configs first (by cost), else by recall —
    // a struct-ordered min over the sweep rows, no window, no floats
    def selKey = struct(
      when(col("recall_micro") >= targetRecallMicro, 0).otherwise(1).as("k1"),
      when(col("recall_micro") >= targetRecallMicro, col("n_pairs"))
        .otherwise(-col("recall_micro")).as("k2"),
      col("nprobe").as("k3"))
    val best = summary.groupBy().agg(min(selKey).as("_best"))
    summary.crossJoin(broadcast(best))
      .select(col("nprobe"), col("n_pairs"), col("n_hits"), col("recall_micro"),
        (selKey === col("_best")).as("chosen"))
      .orderBy(col("nprobe"))
  }

  private def annJoinWithCodebook(left: DataFrame, right: DataFrame,
      idCol: String, vecCol: String,
      codebook: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      k: Int): DataFrame = {
    require(k >= 1, s"annJoin: k must be >= 1, got $k")
    def assign(vec: Column): Column = cell_assign(vec, codebook)
    val l = left.select(col(idCol).as("id_l"), col(vecCol).as("_lvec"))
      .withColumn("_cell", assign(col("_lvec")))
    val r = right.select(col(idCol).as("id_r"), col(vecCol).as("_rvec"))
      .withColumn("_cell", assign(col("_rvec")))
    val scored = l.join(r, "_cell")
      .filter(col("id_l") =!= col("id_r"))
      .withColumn("cosine", round(cosine(col("_lvec"), col("_rvec")), 6))
      .select(col("id_l"), col("id_r"), col("cosine"))
    Windows.topKPerGroup(
        scored.withColumn("_payload", struct(col("id_r"), col("cosine"))),
        Seq("id_l"), "_payload", "cosine", "id_r", k)
      .select(col("id_l"), col("rank"),
        col("_payload.id_r").as("id_r"), col("_payload.cosine").as("cosine"))
  }

  /** Bounded control read of pinned centroid vectors into a BROADCAST
    * codebook, ordered by `centroidIds` (cell i = centroidIds(i)). Codebooks
    * are nlist-sized (~sqrt(N)), never data-scale, so the collect is a
    * justified control read — and unlike the round-5 literal-array form the
    * plan carries only a broadcast id: plan/codegen size is O(1) in nlist,
    * so nlist can reach the 10^4..10^6 a 100 TB corpus wants (executors
    * torrent-fetch the codebook once; every task reads the process-local
    * copy). */
  private[operators] def broadcastCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                                           centroidIds: Seq[Long], who: String)
      : org.apache.spark.broadcast.Broadcast[Array[Array[Double]]] = {
    val byId = collectVectors(corpus, idCol, vecCol, centroidIds, who)
    corpus.sparkSession.sparkContext.broadcast(
      centroidIds.map(id => byId(id)).toArray)
  }

  /** Collect the pinned centroid vectors as doubles, keyed by id, failing
    * loudly on ids missing from the corpus. */
  private def collectVectors(corpus: DataFrame, idCol: String, vecCol: String,
                             centroidIds: Seq[Long], who: String): Map[Long, Array[Double]] = {
    val byId = corpus.filter(col(idCol).isInCollection(centroidIds))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Number](1).map(_.doubleValue()).toArray)
      .toMap
    val missing = centroidIds.filterNot(byId.contains)
    require(missing.isEmpty,
      s"$who: centroid ids not present in the corpus: ${missing.mkString(", ")}")
    byId
  }

  /** Hard-negative mining for contrastive embedding training: for every
    * vector, the top-k most-similar vectors with a DIFFERENT label — close
    * enough to confuse the model, labeled differently, exactly the
    * negatives that carry gradient signal (the easy random negatives a
    * uniform sample would draw are already separated). The label column
    * stands in for whatever supervised signal defines "positive"
    * (source document, query group, class).
    *
    * Same scale posture as [[annJoin]]: row-local cell assignment over the
    * literal codebook, ONE self equi-join on the cell id, the
    * label-difference predicate applied before scoring, and the per-query
    * top-k via the bounded-heap aggregate. Output: (id_l, rank, id_r,
    * cosine), rank 1-based by (cosine DESC, id_r ASC) among negatives
    * sharing the query's cell. */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, corpus: DataFrame,
                    centroidIds: Seq[Long], k: Int): DataFrame = {
    require(centroidIds.nonEmpty, "hardNegatives: centroidIds must be non-empty")
    hardNegativesWithCodebook(emb, idCol, vecCol, labelCol,
      broadcastCodebook(corpus, idCol, vecCol, centroidIds, "hardNegatives"), k)
  }

  /** [[hardNegatives]] with scale-adaptive parameterization (same count ->
    * sqrt(N) -> broadcast-codebook shape as [[annJoinDerived]]): cells stay
    * ~sqrt(N) vectors, so the self-join candidate volume grows ~N^1.5
    * instead of the ~N^2 a pinned nlist degrades to. */
  def hardNegativesDerived(emb: DataFrame, idCol: String, vecCol: String,
                           labelCol: String, k: Int): DataFrame =
    hardNegativesWithCodebook(emb, idCol, vecCol, labelCol,
      derivedCodebook(emb, idCol, vecCol), k)

  private def hardNegativesWithCodebook(emb: DataFrame, idCol: String,
      vecCol: String, labelCol: String,
      codebook: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      k: Int): DataFrame = {
    require(k >= 1, s"hardNegatives: k must be >= 1, got $k")
    def assign(vec: Column): Column = cell_assign(vec, codebook)
    val assigned = emb
      .select(col(idCol).as("_id"), col(vecCol).as("_vec"), col(labelCol).as("_lbl"))
      .withColumn("_cell", assign(col("_vec")))
      .localCheckpoint(false) // one kernel pass feeds both join legs
    val l = assigned.select(col("_cell"), col("_id").as("id_l"),
      col("_vec").as("_lvec"), col("_lbl").as("_lbl_l"))
    val r = assigned.select(col("_cell"), col("_id").as("id_r"),
      col("_vec").as("_rvec"), col("_lbl").as("_lbl_r"))
    val scored = l.join(r, "_cell")
      .filter(!(col("_lbl_l") <=> col("_lbl_r"))) // negatives only, null-safe
      .withColumn("cosine", round(cosine(col("_lvec"), col("_rvec")), 6))
      .select(col("id_l"), col("id_r"), col("cosine"))
    Windows.topKPerGroup(
        scored.withColumn("_payload", struct(col("id_r"), col("cosine"))),
        Seq("id_l"), "_payload", "cosine", "id_r", k)
      .select(col("id_l"), col("rank"),
        col("_payload.id_r").as("id_r"), col("_payload.cosine").as("cosine"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, then treat
    * pairs INSIDE a cluster whose cosine clears `threshold` as semantic
    * duplicates and keep one representative. Unlike [[Dedup.exact]] /
    * MinHash (which need shared surface text), this catches paraphrases and
    * template rewrites — the dedup layer run after exact/near-dup in
    * production LLM corpus builds.
    *
    * Keep rule (deterministic, engine-independent): a vector is DROPPED iff
    * some same-cell vector with a smaller id has round(cosine, 6) >=
    * threshold against it; the smallest id of every duplicate group
    * therefore always survives. The rule is transitive-free (one join, no
    * iteration) — chains a~b~c with cos(a,c) < t still drop b and c, the
    * aggressive end of SemDeDup's spectrum, which is the documented
    * semantics here.
    *
    * Scale design: cell assignment is row-local argmax cosine over the
    * literal codebook (codegen'd, shuffle-free; nlist ~ sqrt(N) keeps cells
    * at ~N/nlist docs so the within-cell pair count is bounded by design —
    * exactly SemDeDup's reason for clustering first); candidates come from
    * ONE self equi-join on the cell id, never a cross join, with AQE
    * splitting skewed cells; the assigned frame is materialized once and
    * feeds both join legs plus the output. Output: (id, cell, keep) — one
    * row per input vector. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    corpus: DataFrame, centroidIds: Seq[Long],
                    threshold: Double): DataFrame = {
    require(centroidIds.nonEmpty, "semanticDedup: centroidIds must be non-empty")
    semanticDedupWithCodebook(emb, idCol, vecCol,
      broadcastCodebook(corpus, idCol, vecCol, centroidIds, "semanticDedup"), threshold)
  }

  /** [[semanticDedup]] with scale-adaptive parameterization (count ->
    * sqrt(N) -> broadcast codebook) — SemDeDup's own sizing: cluster count
    * grows with the corpus so within-cell pair volume stays ~N^1.5, the
    * property the pinned-nlist entry lost. */
  def semanticDedupDerived(emb: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame =
    semanticDedupWithCodebook(emb, idCol, vecCol,
      derivedCodebook(emb, idCol, vecCol), threshold)

  private def semanticDedupWithCodebook(emb: DataFrame, idCol: String,
      vecCol: String,
      codebook: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      threshold: Double): DataFrame = {
    def assign(vec: Column): Column = cell_assign(vec, codebook)
    val assigned = emb
      .select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .withColumn("cell", assign(col("_vec")))
      .localCheckpoint(false) // one kernel pass feeds both join legs + output
    val a = assigned.select(col("cell"), col("_id").as("id_a"), col("_vec").as("_va"))
    val b = assigned.select(col("cell"), col("_id").as("id_b"), col("_vec").as("_vb"))
    val dropped = a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosine(col("_va"), col("_vb")), 6) >= threshold)
      .select(col("id_b").as("_dropped")).distinct()
    assigned
      .join(dropped, col("_id") === col("_dropped"), "left")
      .select(col("_id").as(idCol), col("cell"),
        col("_dropped").isNull.as("keep"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of pinned centroid vectors
    * partitions the corpus into `nlist` lists; each vector is assigned
    * row-local to its max-cosine centroid (argmax over a literal codebook —
    * codegen'd, shuffle-free); a query probes only the `nprobe` lists whose
    * centroids are closest to it, then runs exact cosine inside them.
    *
    * `centroidIds` pins the codebook deterministically to existing vectors
    * (in production these are k-means centroids — always small enough to
    * collect: nlist ~ sqrt(N) codebook rows, not data-scale). Scanning
    * probed lists touches ~nprobe/nlist of the corpus; recall is tunable
    * via nprobe. Ties at the probe threshold include extra lists
    * (deterministic in both engines). */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, centroidIds: Seq[Long], nprobe: Int): DataFrame = {
    require(centroidIds.nonEmpty, "ivfTopK: centroidIds must be non-empty")
    require(nprobe >= 1 && nprobe <= centroidIds.size,
      s"ivfTopK: nprobe must be in 1..${centroidIds.size} (the codebook size), got $nprobe")
    ivfTopKWithCodebook(emb, idCol, vecCol, queryId, k,
      broadcastCodebook(emb, idCol, vecCol, centroidIds, "ivfTopK"), nprobe)
  }

  /** [[ivfTopK]] with scale-adaptive parameterization: the query-side twin
    * of [[annJoinDerived]] — nlist = floor(sqrt(N)) corpus-sampled
    * centroids ([[derivedCodebook]]), probing `nprobe` lists, so the scan
    * touches ~nprobe/sqrt(N) of the corpus whatever its size (a pinned
    * nlist would decay toward a full scan as N grows past it). */
  def ivfTopKDerived(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val codebook = derivedCodebook(emb, idCol, vecCol)
    require(nprobe >= 1 && nprobe <= codebook.value.length,
      s"ivfTopKDerived: nprobe must be in 1..${codebook.value.length} " +
        s"(the derived codebook size), got $nprobe")
    ivfTopKWithCodebook(emb, idCol, vecCol, queryId, k, codebook, nprobe)
  }

  private def ivfTopKWithCodebook(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int,
      codebook: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      nprobe: Int): DataFrame = {
    def cosArr(vec: Column): Column = cell_scores(vec, codebook)
    // 0-based argmax, first index on exact-double ties
    def assign(vec: Column): Column = cell_assign(vec, codebook)
    val assigned = emb.withColumn("_list", assign(col(vecCol)))
    val q = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), cosArr(col(vecCol)).as("_qcos"))
    assigned.crossJoin(broadcast(q))
      .filter(element_at(col("_qcos"), col("_list") + 1) >=
        element_at(sort_array(col("_qcos"), asc = false), nprobe))
      .filter(col(idCol) =!= queryId)
      .withColumn("cosine", round(cosine(col(vecCol), col("_qvec")), 6))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF codebook TRAINING — Lloyd's k-means expressed declaratively (the
    * scale path behind [[ivfTopK]]'s pinned codebook). Per iteration:
    *
    *  - update: per-centroid per-dimension mean over QUANTIZED components —
    *    `floor(v * 2^20)` as a long. The power-of-two scale is exact (no
    *    multiply rounding) and long sums are order-invariant under any
    *    partitioning, so the trained codebook is bit-identical across
    *    engines and physical layouts; double sums would drift with
    *    partition order. One shuffle on (cid, dim), map-side combined.
    *  - assignment: argmin ||v-c||^2 = argmin(c.c - 2 v.c) over the k-row
    *    broadcast codebook (fused dot kernels, sequential accumulation —
    *    engine-reproducible), ties broken by centroid id via a struct min.
    *
    * Init is deterministic random-partition: cid_0 = md5_48(id) mod k.
    * Fixed `iters` (no convergence probe) keeps the result reproducible for
    * the oracle. A centroid that loses all members simply disappears from
    * the codebook (standard Lloyd behavior; callers that need exactly k
    * lists re-seed). Returns (cid, centroid array<double>). */
  def trainIvfCodebook(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val quant = 1048576.0 // 2^20
    var assigned = emb.select(
      col(idCol).as("_id"), col(vecCol).as("_v"),
      pmod(md5_prefix_long(col(idCol)), lit(k.toLong)).cast("int").as("cid"))
    var codebook: DataFrame = null
    for (i <- 1 to iters) {
      val stats = assigned
        .select(col("cid"), posexplode(col("_v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(floor(col("col") * quant).cast("long")).as("_s"),
          count(lit(1)).as("_n"))
      codebook = stats.groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("_s") / quant / col("_n")).as("_m")))),
          x => x.getField("_m")).as("centroid"))
        .localCheckpoint()
      if (i < iters) {
        val cb = codebook.select(col("cid").as("_ccid"), col("centroid"))
          .withColumn("_cc", dot(col("centroid"), col("centroid")))
        assigned = assigned.drop("cid")
          .crossJoin(broadcast(cb))
          .withColumn("_score", col("_cc") - lit(2.0) * dot(col("_v"), col("centroid")))
          .groupBy(col("_id"))
          .agg(first(col("_v")).as("_v"), // constant within the group
            min(struct(col("_score"), col("_ccid"))).as("_best"))
          .select(col("_id"), col("_v"), col("_best").getField("_ccid").as("cid"))
      }
    }
    codebook
  }

  /** Deterministic pseudo-random PQ codebook, pre-quantized to PqUtil's
    * scale: entry (s, c, d) = floor(2^10 * ((md5_48("pq_s_c_d") mod 1000)
    * / 1000 - 0.5)). Same derivation family as the LSH planes, so any
    * engine reproduces it; in production the codebook comes from per-
    * subspace Lloyd k-means (the [[trainIvfCodebook]] machinery applied to
    * vector slices) — always ksub*m rows, never data-scale. */
  def pqCodebookQ(m: Int, ksub: Int, subDim: Int): Seq[Seq[Long]] =
    for { s <- 0 until m; c <- 0 until ksub } yield {
      (0 until subDim).map { d =>
        val hex = MessageDigest.getInstance("MD5")
          .digest(s"pq_${s}_${c}_$d".getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString.substring(0, 12)
        val h = java.lang.Long.parseLong(hex, 16)
        graft.functions.PqUtil.quantize((h % 1000L).toDouble / 1000.0 - 0.5)
      }
    }

  /** Product-quantization ANN (the memory-compression leg): every vector is
    * encoded row-local to m codes (argmin per subspace over the quantized
    * codebook — a fused codegen kernel, no shuffle); the query precomputes
    * one (m x ksub) distance table; approximate distance is m table lookups
    * summed as longs. At 100 TB the corpus scan touches ~dim/m/4 of the
    * bytes a raw-float scan would (codes instead of floats), and in a real
    * deployment the codes column is written once and reused per query.
    * Quantized integer math end to end — bit-identical on any engine.
    *
    * Returns top-k by (approximate distance asc, id asc), query excluded. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int, m: Int, ksub: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pqTopK: m ($m) must divide dim ($dim)")
    val subDim = dim / m
    val cb = pqCodebookQ(m, ksub, subDim)
    val qRow = emb.filter(col(idCol) === queryId).select(col(vecCol)).head()
    val q = qRow.getSeq[Float](0).map(_.toDouble)
    require(q.length >= dim, s"pqTopK: query vector has ${q.length} dims, need $dim")
    // query-side distance table dt(s)(c), driver-computed in the same
    // quantized integer arithmetic as the kernel
    val dt: Seq[Seq[Long]] = (0 until m).map { s =>
      (0 until ksub).map { c =>
        val cent = cb(s * ksub + c)
        (0 until subDim).map { d =>
          val diff = graft.functions.PqUtil.quantize(q(s * subDim + d)) - cent(d)
          diff * diff
        }.sum
      }
    }
    val encoded = emb.withColumn("_codes", pq_encode(col(vecCol), cb, m, ksub))
    val adist = (0 until m).map { s =>
      element_at(array(dt(s).map(lit): _*), element_at(col("_codes"), s + 1) + 1)
    }.reduce(_ + _)
    encoded
      // unencodable vectors (null element / too few dims -> NULL codes) are
      // excluded rather than letting a NULL adist sort ahead of every real
      // neighbor under asc ordering
      .filter(col("_codes").isNotNull)
      .filter(col(idCol) =!= queryId)
      .withColumn("adist", adist)
      .select(col(idCol), col("adist"))
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(k)
  }

  /** PQ codebook TRAINING — per-subspace Lloyd k-means (the trained
    * alternative to [[pqCodebookQ]]'s pseudo-random codebook, exactly the
    * [[trainIvfCodebook]] recipe with the subspace id carried through every
    * key): vectors are sliced into m subvectors row-local, initial codes
    * are md5(id ++ sub) mod ksub, means are per-(sub, cid, dim) sums of
    * `floor(v * 2^20)` quantized longs (order-invariant, engine-exact),
    * assignment is argmin(c.c - 2 v.c) over the ksub-row broadcast per-sub
    * codebook with ties to the lowest cid. One shuffle per iteration on
    * (sub, cid, dim), map-side combined; nothing data-scale collected.
    * Returns (sub, cid, centroid array<double> of subDim). */
  def trainPqCodebook(emb: DataFrame, idCol: String, vecCol: String,
                      m: Int, ksub: Int, iters: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"trainPqCodebook: m ($m) must divide dim ($dim)")
    require(ksub >= 1 && iters >= 1, s"ksub and iters must be >= 1")
    val subDim = dim / m
    val quant = 1048576.0 // 2^20, matching trainIvfCodebook
    var assigned = emb.select(col(idCol).as("_id"),
        posexplode(array((0 until m).map(s =>
          slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim)): _*)))
      .select(col("_id"), col("pos").as("sub"), col("col").as("_v"))
      .withColumn("cid", pmod(md5_prefix_long(
        concat(col("_id").cast("string"), lit("_"), col("sub").cast("string"))),
        lit(ksub.toLong)).cast("int"))
    var codebook: DataFrame = null
    for (i <- 1 to iters) {
      val stats = assigned
        .select(col("sub"), col("cid"), posexplode(col("_v")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(sum(floor(col("col") * quant).cast("long")).as("_s"),
          count(lit(1)).as("_n"))
      codebook = stats.groupBy("sub", "cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("_s") / quant / col("_n")).as("_m")))),
          x => x.getField("_m")).as("centroid"))
        .localCheckpoint()
      if (i < iters) {
        val cb = codebook.select(col("sub").as("_csub"), col("cid").as("_ccid"),
            col("centroid"))
          .withColumn("_cc", dot(col("centroid"), col("centroid")))
        assigned = assigned.drop("cid")
          .join(broadcast(cb), col("sub") === col("_csub"))
          .withColumn("_score", col("_cc") - lit(2.0) * dot(col("_v"), col("centroid")))
          .groupBy(col("_id"), col("sub"))
          .agg(first(col("_v")).as("_v"),
            min(struct(col("_score"), col("_ccid"))).as("_best"))
          .select(col("_id"), col("sub"), col("_v"),
            col("_best").getField("_ccid").as("cid"))
      }
    }
    codebook
  }

  /** IVF-PQ ANN — the composed production index shape (FAISS's IVFPQ): a
    * coarse quantizer routes each vector to its max-cosine list (the
    * [[ivfTopK]] machinery), PQ encodes the RESIDUAL vector w.r.t. the list
    * centroid (residuals are small, so the same code budget carries more
    * precision than raw-vector PQ), and a query probes `nprobe` lists with
    * one ADC lookup table per list. Everything after the residual
    * subtraction is quantized integer math (engine-exact, like [[pqTopK]]);
    * the residual itself is one IEEE double subtraction per component —
    * bit-identical on any engine.
    *
    * At 100 TB: assignment + residual + encode are row-local (one scan,
    * written once as (list, codes)); a query reads ~nprobe/nlist of the
    * corpus and only the code bytes of that slice. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, centroidIds: Seq[Long], nprobe: Int,
                m: Int, ksub: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"ivfPqTopK: m ($m) must divide dim ($dim)")
    require(nprobe >= 1 && nprobe <= centroidIds.size,
      s"ivfPqTopK: nprobe must be in 1..${centroidIds.size}, got $nprobe")
    val subDim = dim / m
    val cbPq = pqCodebookQ(m, ksub, subDim)
    val codebook = broadcastCodebook(emb, idCol, vecCol, centroidIds, "ivfPqTopK")
    def cosArr(vec: Column): Column = cell_scores(vec, codebook)
    def assign(vec: Column): Column = cell_assign(vec, codebook)
    // query-side: one quantized ADC table per list (nlist x m x ksub longs,
    // driver-computed in the same integer arithmetic as the kernel and
    // BROADCAST — the round-5 literal form put nlist*m*ksub literals in the
    // plan, which caps nlist; the broadcast keeps the plan O(1) in nlist)
    val cents: Seq[Array[Double]] = codebook.value.toSeq
    val q = byIdOrRow(emb, idCol, vecCol, queryId)
    val dt: Array[Array[Array[Long]]] = cents.map { c =>
      val rq = (0 until dim).map(d => q(d) - c(d))
      (0 until m).map { s =>
        (0 until ksub).map { cc =>
          (0 until subDim).map { d =>
            val diff = graft.functions.PqUtil.quantize(rq(s * subDim + d)) -
              cbPq(s * ksub + cc)(d)
            diff * diff
          }.sum
        }.toArray
      }.toArray
    }.toArray
    val dtBc = emb.sparkSession.sparkContext.broadcast(dt)
    val assigned = emb
      .withColumn("_v", col(vecCol).cast("array<double>"))
      .withColumn("_list", assign(col("_v")))
      .withColumn("_res", zip_with(col("_v"),
        centroid_at(col("_list"), codebook), (a, b) => a - b))
      .withColumn("_codes", pq_encode(col("_res"), cbPq, m, ksub))
    val qFrame = assigned.filter(col(idCol) === queryId)
      .select(cosArr(col("_v")).as("_qcos"))
    val adist = adc_distance(col("_list"), col("_codes"), dtBc)
    assigned.crossJoin(broadcast(qFrame))
      .filter(element_at(col("_qcos"), col("_list") + 1) >=
        element_at(sort_array(col("_qcos"), asc = false), nprobe))
      // same unencodable-row exclusion as pqTopK: NULL codes must not
      // produce a NULL adist that wins the asc sort
      .filter(col("_codes").isNotNull)
      .filter(col(idCol) =!= queryId)
      .withColumn("adist", adist)
      .select(col(idCol), col("adist"))
      .orderBy(col("adist").asc, col(idCol).asc)
      .limit(k)
  }

  /** One-row bounded control read of a vector by id (query vectors,
    * centroids — never data-scale). */
  private def byIdOrRow(emb: DataFrame, idCol: String, vecCol: String,
                        id: Long): Seq[Double] = {
    val rows = emb.filter(col(idCol) === id).select(col(vecCol)).head(1)
    require(rows.nonEmpty, s"vector id $id not present in the corpus")
    rows(0).getSeq[Float](0).map(_.toDouble)
  }

  /** ANN top-k: restrict the scan to vectors in the query's LSH bucket, then
    * exact cosine inside the bucket. With B buckets this scans ~1/B of the
    * data; recall is tunable via numPlanes (and multi-probe if needed). */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numPlanes: Int, dim: Int): DataFrame = {
    val withBucket = emb.withColumn("_bucket", lshBucket(emb, col(vecCol), numPlanes, dim))
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qvec"), col("_bucket").as("_qbucket"))
    withBucket
      .join(broadcast(q), col("_bucket") === col("_qbucket"))
      .filter(col(idCol) =!= queryId)
      .withColumn("cosine", round(cosine(col(vecCol), col("_qvec")), 6))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
