package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile-threshold operators: the at-scale form of "the top fraction of
  * a table" (SURVEY W1's hot decile). `orderBy().limit(k)` plans as
  * TakeOrderedAndProject — per-partition top-k plus a k·P driver merge —
  * which is exactly right while k fits the driver, and meaningless when
  * k = n/10 of a 10^10-row table. The scale path here: one
  * approxQuantile pass (Greenwald-Khanna sketch — the driver holds
  * O(1/relativeError) samples, never k rows) for the threshold, then a
  * plain filter that pushes to the source — no global sort, no TakeOrdered
  * of n/10 rows, and the result stays distributed.
  */
object Quantiles {

  /** All rows whose `valueCol` is in the top `fraction` of the table,
    * tie-inclusive: result = { x : x ≥ k-th largest value }, k =
    * ceil(n·fraction) — with distinct values exactly the top-k set; ties
    * at the boundary are all kept (the only distributable semantics: no
    * arbitrary winner among equals).
    *
    * relativeError = 0 computes the threshold exactly (GK retains every
    * sample; fine at test scale). At corpus scale use the default or
    * larger: the threshold lands within relativeError·n ranks of the
    * boundary, the sketch stays tiny, and the scan count is 3 narrow
    * passes (count, sketch, filter) independent of k.
    *
    * GK-with-zero-error convention (pinned by OpsSpec across n and p):
    * approxQuantile(p) returns the element at ascending rank ceil(p·n).
    * The threshold element is rank n−k+1, so p is centered at
    * (n−k+1−½)/n where float noise cannot shift the ceil.
    */
  def topFraction(df: DataFrame, valueCol: String, fraction: Double,
      relativeError: Double = 0.001): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction $fraction not in (0,1]")
    require(relativeError >= 0.0, s"relativeError $relativeError")
    val n = df.count()
    if (n == 0L) return df
    val k = math.max(1L, math.ceil(n * fraction).toLong)
    val targetRank = n - k + 1
    val p = (targetRank - 0.5) / n
    val thr = df.stat.approxQuantile(valueCol, Array(p), relativeError).head
    df.filter(col(valueCol) >= thr)
  }
}
