package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-defeating equi-joins for the case a broadcast join can't cover: the
  * build side is too large to broadcast AND the probe side's key histogram is
  * heavy-tailed (a handful of keys carry most rows — in the reference's
  * domain, one account or category holding most transactions;
  * MonarchMoneyMain-v3.py:1104-1110 sidesteps this only because its data is
  * tiny). A plain shuffle join sends every row of a hot key to one reducer —
  * the straggler that dominates wall-clock at 100 TB.
  *
  * Technique: salt the probe side (deterministically, from a per-row column,
  * so results stay oracle-reproducible), replicate the build side once per
  * salt, join on (key, salt). Hot keys fan out over `salt` reducers; the
  * build side grows by `salt`×, which is why [[saltedJoinHotKeys]] — salt
  * only the keys that measure hot, leave the cold tail un-replicated — is
  * the form to reach for first.
  *
  * Spark's AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`) handles the
  * sort-merge case at runtime by splitting oversized partitions; these
  * helpers are for when you need the fan-out *planned* (hash joins,
  * pre-AQE-decided layouts) or keyed finer than partition granularity.
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, with the fact side salted
    * into `salt` sub-keys and the dim side replicated `salt` times.
    * Result rows are identical to `fact.join(dim, key)` — only the shuffle
    * distribution changes.
    *
    * @param saltBy fact column whose hash spreads a hot key's rows (use a
    *               unique id; must be deterministic for reproducible plans)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: String, salt: Int = 8): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(col(saltBy)), lit(salt)).cast("int"))
    val explodedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** [[saltedJoin]] restricted to measured-hot keys: one counting pass over
    * the fact side finds keys above `hotThreshold` rows (driver-safe — the
    * hot-key set is by definition small), those fan out over `salt` reducers,
    * every other key joins un-replicated. The dim side grows only by
    * |hotKeys| × salt rows. This is the shape that survives 100 TB: the
    * counting pass is a map-side-combined groupBy, and the replication cost
    * is proportional to the skew, not the dim size. */
  def saltedJoinHotKeys(fact: DataFrame, dim: DataFrame, key: String,
                        saltBy: String, salt: Int = 8,
                        hotThreshold: Long = 1000000L): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val hotKeys = fact.groupBy(col(key)).count()
      .filter(col("count") > hotThreshold)
      .select(col(key)).collect().map(_.get(0))
    if (hotKeys.isEmpty) return fact.join(dim, Seq(key))

    val isHot = col(key).isInCollection(hotKeys)
    val saltedFact = fact.withColumn("__salt",
      when(isHot, pmod(xxhash64(col(saltBy)), lit(salt)).cast("int")).otherwise(lit(0)))
    val explodedDim = dim.withColumn("__salt",
      explode(when(isHot, sequence(lit(0), lit(salt - 1))).otherwise(array(lit(0)))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
