package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1-J4 — dimension lookup joins. The reference builds driver-side hash maps
  * (acct_name_by_id, MonarchMoneyMain-v3.py:1104-1110) and probes them per
  * row; the distributed equivalent is an explicit broadcast hash join of a
  * bona-fide dimension (accounts/categories are dozens-to-thousands of rows,
  * never data-scale), left-outer with a default for missing keys.
  */
object Lookup {

  /** Left-outer broadcast join of `dim` onto `fact`, projecting the requested
    * dim attributes with per-column defaults for unmatched keys (the
    * reference defaults missing display names to "", v3:1272-1274).
    *
    * @param attrs (dimColumn, outputName, defaultLiteral) triples
    */
  def join(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      attrs: Seq[(String, String, Any)]): DataFrame = {
    val dimSel = dim.select((dimKey +: attrs.map(_._1)).distinct.map(col): _*)
    val joined = fact.join(broadcast(dimSel), fact(factKey) === dimSel(dimKey), "left")
    val withAttrs = attrs.foldLeft(joined) { case (d, (dimCol, out, default)) =>
      d.withColumn(out, coalesce(dimSel(dimCol), lit(default)))
    }
    (dimSel(dimKey) +: attrs.map(a => dimSel(a._1))).foldLeft(withAttrs)(_ drop _)
  }
}
