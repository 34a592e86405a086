package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the canonical tokenizer-construction
  * step of an LLM data pipeline (Sennrich et al. 2016; the GPT-2/LLaMA
  * tokenizers are trained exactly this way): repeatedly find the most
  * frequent adjacent symbol pair in the corpus and fuse it into a new
  * symbol.
  *
  * Scale design — the part that matters at 100 TB:
  *
  *  - The corpus is scanned ONCE, into a word-frequency table (one
  *    map-side-combined shuffle keyed on the word). Every merge round after
  *    that operates on the VOCABULARY (bounded: distinct words, ~10^5-10^6
  *    at web scale), never on the corpus again. This is how production BPE
  *    trainers work (word counts in, merges out) and turns an
  *    O(rounds x corpus) algorithm into O(corpus + rounds x vocab).
  *  - Pair statistics are weighted by word frequency and built ROW-LOCAL
  *    (an index transform over the symbol array — no symbol-level shuffle);
  *    the only per-round shuffle is the pair-keyed aggregate, whose result
  *    is pair-vocabulary-sized.
  *  - The winning pair is a ONE-ROW control collect per round (the
  *    broadcast-codebook posture: bounded, never data-scale), injected as
  *    literals into the next round's plan.
  *  - Merge application must be LEFT-TO-RIGHT NON-OVERLAPPING (canonical
  *    BPE: "a a a a" under merge (a,a) becomes "aa aa", not three
  *    overlapping merges). Overlap is only possible when left==right, and
  *    candidate start positions then form consecutive runs; keeping the
  *    odd-ranked (1st, 3rd, ...) candidates of each run is exactly the LTR
  *    scan. Runs are identified with plain window functions, so the whole
  *    round is native, codegen-friendly, and REPLAYABLE IN ANY ENGINE —
  *    the DuckDB oracle runs the same algebra, there is no
  *    implementation-defined regex/replace semantics to diverge on.
  *  - Each round ends in a localCheckpoint of the (vocab-sized) word table:
  *    8 rounds of windows would otherwise stack into one enormous plan and
  *    re-execute every prior round per action.
  *
  * Reference scope: the reference pipeline has no tokenizer trainer; this
  * is part of the training-data extension surface (like t16/t20/t22, whose
  * vocabulary statistics are this operator's inputs conceptually).
  */
object Bpe {

  /** Word-frequency table from a text column: lowercase, strip non-letters,
    * whitespace-split. Output: (word, freq, syms) where syms is the
    * character-symbol array — transform(sequence)+substring, the same
    * construction every engine expresses identically (split-on-empty-string
    * is engine-defined; this is not). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(regexp_replace(lower(col(textCol)), "[^a-z]+", " "),
        "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))

  /** One selected merge. */
  final case class Merge(round: Int, left: String, right: String, pairFreq: Long)

  /** Train `rounds` BPE merges over the corpus. Returns the merge table:
    * (round, left, right, pair_freq), round 1-based in selection order.
    * Ties on pair frequency break lexicographically (left ASC, right ASC) —
    * a total order, so training is deterministic on any engine. */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // pair stats: row-local adjacent-pair build, ONE pair-keyed shuffle
      val top = words
        .select(col("freq"),
          explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(element_at(col("syms"), i + 1).as("l"),
                          element_at(col("syms"), i + 2).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r"))
        .limit(1)
        .collect() // ONE row — bounded control read, the codebook posture
      top.headOption match {
        case None => exhausted = true
        case Some(Row(a: String, b: String, pf: Long)) =>
          merges += Merge(r, a, b, pf)
          // apply the merge ROW-LOCAL ([[segmentLocal]]'s path — spec-pinned
          // equal to the window algebra): per-word application is a pure
          // function, so the windowed form's per-round exchange + sort
          // tower + join + re-agg over symbol-level rows buys nothing here.
          // [[applyMerge]] remains the cross-engine-replayable reference
          // semantics (the oracle's unrolled CTEs mirror it; [[segment]]
          // still runs it). (guide §2.4: remove shuffles outright)
          words = segmentLocal(words, Seq((a, b))).localCheckpoint()
          r += 1
        case Some(other) =>
          throw new IllegalStateException(s"unexpected pair row: $other")
      }
    }
    merges.toSeq.toDF("round", "left", "right", "pair_freq")
  }

  /** Apply one merge (a, b) -> "ab" to the word table's symbol arrays with
    * canonical LTR non-overlap semantics. Words not containing the pair
    * pass through the same algebra unchanged (vocab-sized, not worth a
    * split-and-union). */
  private[operators] def applyMerge(words: DataFrame, a: String, b: String): DataFrame = {
    val byWord = Window.partitionBy(col("word")).orderBy(col("p"))
    val sym = words
      .select(col("word"), col("freq"), posexplode(col("syms")).as(Seq("p", "s")))
      .withColumn("nxt", lead(col("s"), 1).over(byWord))
    // candidate starts; runs of consecutive candidate positions (possible
    // only when a == b) keep their odd-ranked members — the LTR scan
    val starts = sym
      .filter(col("s") === lit(a) && col("nxt") === lit(b))
      .withColumn("run", col("p") - row_number().over(byWord))
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("word"), col("run"))
          .orderBy(col("p"))))
      .filter(col("rk") % 2 === 1)
      .select(col("word").as("_mw"), col("p").as("_mp"))
    sym
      .join(starts, col("word") === col("_mw") && col("p") === col("_mp"),
        "left_outer")
      .withColumn("m", col("_mp").isNotNull)
      .withColumn("consumed", // the right half of each merge disappears
        coalesce(lag(col("m"), 1).over(byWord), lit(false)))
      .filter(!col("consumed"))
      .withColumn("tok",
        when(col("m"), concat(col("s"), col("nxt"))).otherwise(col("s")))
      .groupBy(col("word"), col("freq"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
        x => x("tok")).as("syms"))
  }

  /** Segment the word table with a trained merge list (the tokenizer's
    * "apply" half): replays the merges in order and returns (word, freq,
    * syms) with the final segmentation — the table a token-count audit or
    * an encoder export consumes. The merge list is the model: bounded,
    * driver-resident, applied as literals.
    *
    * This is the distributed window-algebra form (one plan per merge) —
    * the cross-engine-replayable reference semantics. Production encoding
    * uses [[segmentLocal]]: same result, zero shuffles. */
  def segment(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words) { case (w, (a, b)) => applyMerge(w, a, b).localCheckpoint() }

  /** Canonical LTR non-overlapping application of one merge to a symbol
    * sequence — the in-memory twin of [[applyMerge]] (spec-pinned equal). */
  private[operators] def applyMergeLocal(syms: IndexedSeq[String],
                                         a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2 // consume the pair; LTR scan resumes after it
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Row-local segmentation — the ENCODE path at scale: the merge list is
    * the (bounded, broadcast-by-closure) model and per-word application is
    * a pure function, so the whole encode is one mapPartitions projection
    * with ZERO shuffles — versus [[segment]]'s one windowed plan per merge.
    * Results are identical (the spec asserts it on same-symbol chains,
    * where LTR semantics bite). */
  def segmentLocal(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val schema = words.select(col("word"), col("freq"), col("syms")).schema
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    words.select(col("word"), col("freq"), col("syms")).mapPartitions { rows =>
      rows.map { r =>
        val syms0 = r.getSeq[String](2).toIndexedSeq
        val out = merges.foldLeft(syms0) { case (s, (a, b)) => applyMergeLocal(s, a, b) }
        Row(r.get(0), r.get(1), out)
      }
    }(enc)
  }
}
