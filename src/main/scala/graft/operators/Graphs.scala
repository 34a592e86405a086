package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl-derived corpora. PageRank is the classic
  * crawl-prioritization / source-quality signal a web-scale training-data
  * pipeline computes before filtering: rank the page graph, keep (or
  * up-weight) documents from high-rank hosts.
  *
  * Scale design: power iteration with ONE rank-keyed join and ONE
  * dst-keyed aggregate per iteration — the irreducible shuffles of
  * distributed PageRank. Out-degrees are computed once and joined (never
  * recomputed per iteration); the graph frame is reused across iterations
  * (at cluster scale: cache edges, pre-partitioned by src, so each
  * iteration's join co-locates with the rank table hashed on the same
  * key). Node count and per-iteration dangling mass ride the plan as
  * broadcast one-row frames (the TfIdf corpus-count posture — no driver
  * round trip). Ranks localCheckpoint per iteration: k iterations would
  * otherwise stack into one re-executing mega-plan.
  */
object Graphs {

  /** Power-iteration PageRank. Input: an edge list (srcCol, dstCol) and a
    * node frame (idCol) — nodes, not edges, define the universe, so
    * isolated pages keep the teleport rank instead of vanishing. Dangling
    * nodes (no out-edges) redistribute their mass uniformly each iteration
    * (the standard correction; dropping it leaks total rank). Output:
    * (id, rank) after `iterations` rounds from the uniform start, NOT
    * normalized — total mass stays 1 by construction.
    *
    * Engine parity note: each iteration is + and / over the previous
    * ranks; summation order differs across engines only in final ulps, so
    * consumers that need cross-engine identity should round the OUTPUT
    * (and order by the rounded value) — the entry does exactly that. */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String, dstCol: String, iterations: Int,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // materialized once: every iteration reads the node set (rank rebuild),
    // the edge list (contribs) and the out-degree table TWICE (dangling
    // anti-join + contribs join) — without the checkpoints the upstream
    // node/edge derivations re-execute 2x per iteration (guide §5; node-
    // and edge-sized, the iterative-graph posture the CC labelers share)
    val ids = nodes.select(col(idCol).as("id")).localCheckpoint(false)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(false)
    // one-row broadcast frames keep counts in-plan (no driver collect)
    val n = broadcast(ids.agg(count(lit(1)).cast("double").as("_n")))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("_deg"))
      .localCheckpoint(false)
    var ranks = ids.crossJoin(n).select(col("id"), (lit(1.0) / col("_n")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val prev = ranks
      // mass of dangling nodes this iteration — a one-row broadcast agg
      val dangling = broadcast(
        ranks.join(outDeg, col("id") === col("src"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm")))
      val contribs = e
        .join(outDeg, "src")
        .join(ranks, col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("_deg")).as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_in"))
      ranks = ids
        .join(contribs, col("id") === col("dst"), "left_outer")
        .crossJoin(n).crossJoin(dangling)
        .select(col("id"),
          ((lit(1.0) - damping) / col("_n") +
            lit(damping) * (coalesce(col("_in"), lit(0.0)) + col("_dm") / col("_n")))
            .as("rank"))
        .localCheckpoint()
      // the superseded iteration's rank blocks are dead once the eager
      // checkpoint above has materialized — release them or k iterations
      // retain k node-scale frames ([[graft.operators.Blocks]])
      Blocks.drop(prev)
    }
    ranks
  }

  /** Per-node triangle participation counts over an undirected graph —
    * the local clustering signal (cohesive co-purchase bundles, tightly
    * interlinked host clusters) that complements the global ranks of
    * [[pageRank]] and the component labels of the dedup clusterers.
    * Input edges may be directed / duplicated / self-looped; they are
    * canonicalized to distinct `a < b` pairs first (each undirected edge
    * exactly once, self-loops dropped). Output: (id, n_triangles) for
    * every node in at least one triangle.
    *
    * Scale design: the compact-forward algorithm. Canonical orientation
    * (low id → high id) means every triangle a<b<c is found EXACTLY once
    * as wedge (a→b, b→c) closed by edge (a→c) — no post-hoc dedup of the
    * 6 permutations. Two equi-joins total: the wedge join keyed on the
    * shared middle vertex, the closure join keyed on the (a, c) pair —
    * both plain shuffle-hash-joinable, nothing cartesian. Wedge fan-out is
    * Σ_v out(v)·in(v), the standard bound; at web scale the orientation
    * would be by DEGREE rather than id (orienting low-degree → high-degree
    * caps out-degrees at O(√m) and hence wedges at O(m^1.5)) — an
    * input-side permutation of node ids, not a different plan. The
    * per-node count explodes each found triangle into its three corners
    * and map-side-combines: triangle-count-sized, never wedge-sized. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // materialized once: the canonical edge set feeds THREE legs of the
    // wedge-close plan (e1/e2/e3) and Catalyst does not reuse the exchange
    // across differently-keyed joins — without this the entire upstream
    // edge derivation (for q78, a fact-scale self-join + support aggregate)
    // re-executes per leg (guide §5; the edge set is the sparse graph,
    // bounded far below the fact it came from)
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(false)
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"))
      .select(col("x"), col("y"), col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
