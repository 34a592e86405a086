package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Two registration paths, one definition list:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) injects them at session
  *    build time — the standard way a Spark library ships functions;
  *  - [[Functions.register]] adds them to an already-running session.
  *
  * After either, every kernel is callable from plain SQL:
  * `SELECT parse_money(amount), minhash_signature(text, 5, 16) FROM t`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // graft-catalog view documents expand at resolution time (OSS Spark
    // ships ViewCatalog without analyzer wiring — see ViewSubstitution)
    ext.injectResolutionRule(_ => graft.plans.ViewSubstitution)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = {
    require(e.foldable, s"$fn: argument $pos must be a constant")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def doubleArg(e: Expression, fn: String, pos: Int): Double = {
    require(e.foldable, s"$fn: argument $pos must be a constant")
    // SQL fractional literals parse as DecimalType — not a java.lang.Number
    e.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument $pos must be numeric, got $other")
    }
  }

  /** name -> SQL builder for every custom expression in the engine. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "parse_money" -> (e => ParseMoney(e.head)),
    "money_clean" -> (e => MoneyClean(e.head)),
    "minhash_signature" -> (e =>
      MinhashSignature(e.head, intArg(e(1), "minhash_signature", 2),
        intArg(e(2), "minhash_signature", 3))),
    "shingle_hash_set" -> (e =>
      ShingleHashSet(e.head, intArg(e(1), "shingle_hash_set", 2))),
    "ngram_hash_set" -> (e =>
      NgramHashSet(e.head, intArg(e(1), "ngram_hash_set", 2))),
    "winnow_fingerprints" -> (e =>
      WinnowFingerprints(e.head, intArg(e(1), "winnow_fingerprints", 2),
        intArg(e(2), "winnow_fingerprints", 3))),
    "minhash_from_hashes" -> (e =>
      MinhashFromHashes(e.head, intArg(e(1), "minhash_from_hashes", 2))),
    "simhash" -> (e => SimHash(e.head, intArg(e(1), "simhash", 2))),
    "jaccard_sorted" -> (e => JaccardSorted(e.head, e(1))),
    "jaccard_ge" -> (e => JaccardGe(e.head, e(1), doubleArg(e(2), "jaccard_ge", 3))),
    // key args cast to string like the Column-API wrappers, so any key
    // type hashes identically through both surfaces
    "bloom_agg" -> (e =>
      BloomAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          e.head, org.apache.spark.sql.types.StringType),
        intArg(e(1), "bloom_agg", 2), intArg(e(2), "bloom_agg", 3))),
    "bloom_contains" -> (e =>
      BloomContains(e.head,
        org.apache.spark.sql.catalyst.expressions.Cast(
          e(1), org.apache.spark.sql.types.StringType),
        intArg(e(2), "bloom_contains", 3), intArg(e(3), "bloom_contains", 4))),
    "top_k_by" -> (e => TopKBy(e.head, e(1), e(2), intArg(e(3), "top_k_by", 4))),
    "kmv_distinct" -> (e => KmvDistinct(e.head, intArg(e(1), "kmv_distinct", 2))),
    "hll_distinct" -> (e => HllDistinct(e.head)),
    "hll_registers" -> (e => HllRegisters(e.head)),
    "hll_merge_est" -> (e => HllMergeEst(e.head)),
    "dot_product" -> (e => DotProduct(e.head, e(1))),
    "cosine_similarity" -> (e => CosineSim(e.head, e(1))),
    "l2_norm" -> (e => L2Norm(e.head)),
    "lang_id" -> (e => LangId(e.head)),
    "nfc_clean" -> (e => NfcClean(e.head)),
    "term_counts" -> (e => TermCounts(e.head, intArg(e(1), "term_counts", 2))),
    "quality_signals" -> (e => QualitySignals(e.head)),
    "pq_encode" -> (e => {
      require(e(1).foldable, "pq_encode: argument 2 (codebook) must be a constant")
      // SQL integer literals make the codebook array<array<int>> — widen
      // per the declared element type instead of assuming long
      val elemType = e(1).dataType match {
        case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(et, _), _) => et
        case other => throw new IllegalArgumentException(
          s"pq_encode: codebook must be array<array<int|bigint>>, got ${other.catalogString}")
      }
      val ad = e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val cb = (0 until ad.numElements()).map { i =>
        val inner = ad.getArray(i)
        elemType match {
          case org.apache.spark.sql.types.LongType => inner.toLongArray().toSeq
          case org.apache.spark.sql.types.IntegerType => inner.toIntArray().map(_.toLong).toSeq
          case other => throw new IllegalArgumentException(
            s"pq_encode: codebook elements must be int or bigint, got ${other.catalogString}")
        }
      }
      PqEncode(e.head, cb, intArg(e(2), "pq_encode", 3), intArg(e(3), "pq_encode", 4))
    }))
}
