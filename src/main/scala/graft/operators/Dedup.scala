package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions._

/** Deduplication suite for training-data pipelines (BASELINE.json north
  * star): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design:
  *  - signatures are computed row-local (array lambdas — one pass, no
  *    shuffle, whole-stage codegen);
  *  - candidate generation is an equi-join on (band, bucket) — the only
  *    shuffle, keyed so Spark hash-partitions it; never an all-pairs cross
  *    join;
  *  - all hashing derives from md5 so results are deterministic and
  *    engine-independent (oracle-checkable).
  */
object Dedup {

  /** Exact dedup: canonical representative per identical key (min id) plus
    * duplicate count. Hash-groupBy with map-side combine; at 100 TB this is
    * one shuffle on the 128-bit content hash, never on the full text. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(md5(concat_ws(" ", keyCols.map(col): _*)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Stable per-shingle 48-bit hash (md5-prefix). */
  private def shingleHash(g: Column): Column = md5_prefix_long(g)

  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** MinHash signature: `numHashes` permutations h_j(x) = (a_j*x + b_j) mod p
    * with a_j = 2j+1 (odd), b_j = (j * 2654435761) mod p (Knuth multiplicative
    * constant). Entirely row-local: shingling, hashing and the per-j min all
    * happen inside array expressions — zero shuffle, one text scan. */
  def minhashSignature(text: Column, k: Int = 5, numHashes: Int = 16): Column = {
    val sh = shingles(text, k)
    val hashes = array_distinct(transform(sh, shingleHash(_)))
    transform(
      sequence(lit(0L), lit(numHashes - 1L)),
      j => array_min(transform(hashes, h =>
        pmod(h * (j * lit(2L) + lit(1L)) + pmod(j * lit(2654435761L), lit(MinhashPrime)),
             lit(MinhashPrime)))))
  }

  /** LSH banding: signature split into `bands` bands of `rowsPerBand`;
    * bucket id = md5(band index ++ band slice). Output one row per (doc,
    * band) — the join key for candidate generation. */
  def lshBuckets(df: DataFrame, idCol: String, sig: Column,
                 bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), sig.as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("_", concat_ws(",", b.cast("string")),
            concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

  /** Candidate pairs: docs sharing any (band, bucket). Equi-join shuffle on
    * the bucket hash; `<` keeps each unordered pair once. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over distinct k-shingle sets for given pairs (the
    * verification step after LSH candidate generation). */
  def withJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                  textCol: String, k: Int = 5): DataFrame = {
    val sets = docs.select(col(idCol).as("_jid"),
      array_distinct(shingles(col(textCol), k)).as("_jset"))
    pairs
      .join(sets.withColumnRenamed("_jid", "id_a").withColumnRenamed("_jset", "set_a"), "id_a")
      .join(sets.withColumnRenamed("_jid", "id_b").withColumnRenamed("_jset", "set_b"), "id_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))).cast("double"), 6))
      .drop("set_a", "set_b")
  }

  /** Full MinHash-LSH near-dup pipeline: signature -> bands -> candidate
    * pairs -> exact-Jaccard verification -> threshold. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 5, bands: Int = 4, rowsPerBand: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val sig = minhashSignature(col(textCol), k, bands * rowsPerBand)
    val buckets = lshBuckets(docs, idCol, sig, bands, rowsPerBand)
    val pairs = candidatePairs(buckets, idCol)
    withJaccard(pairs, docs, idCol, textCol, k).filter(col("jaccard") >= threshold)
  }

  /** SimHash (32-bit): per-token md5-derived hash; each bit position
    * accumulates +1/-1 across tokens; the sign of each sum becomes the
    * fingerprint bit. Row-local (nested array folds), no shuffle. */
  def simhash(text: Column, bits: Int = 32): Column = {
    val toks = tokens(text)
    val hs = transform(toks, t => md5_prefix_long(t))
    // bit b (MSB first): 1 iff sum over tokens of (2*bit_b(h) - 1) > 0
    aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      lit(0L),
      (acc, b) => acc * 2 + when(
        aggregate(hs, lit(0L),
          (s, h) => s + (pmod(shiftright_dyn(h, b), lit(2L)) * 2 - 1)) > 0,
        lit(1L)).otherwise(lit(0L)))
  }

  /** shiftright with a Column shift amount (the functions._ overload only
    * accepts a literal Int; the underlying SQL function accepts columns). */
  private def shiftright_dyn(x: Column, n: Column): Column =
    call_function("shiftright", x, n)

  /** Hamming distance between two simhash values (packed longs). */
  def hammingDistance(a: Column, b: Column, bits: Int = 32): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("int")

  /** Embedding near-dup: pairs inside a blocking key with cosine above a
    * threshold. Blocking keeps the join an equi-join (shuffle on block key,
    * AQE handles block skew) instead of a cross join. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("block"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = emb.select(col(blockCol).as("block"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, "block")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("block", "id_a", "id_b", "cosine")
  }
}
