package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series trends re-expressing the reference's TrendAnalyzer
  * (/root/reference/crawler/analysis/trend_analyzer.py):
  *
  *   - bucket key (:25-31): daily = calendar date; weekly = the Monday of
  *     the ISO week — Spark's date_trunc('week') is Monday-based too;
  *   - date-range filter (:33-52): rows with null created_at are DROPPED;
  *     start normalized to 00:00, end to 23:59:59;
  *   - sentiment trend (:55-75): per-bucket avg(post score) + count,
  *     ordered by date;
  *   - keyword/issue mention trend (:77-127): count posts whose
  *     lower(title+' '+body) contains the keyword (any of the issue's
  *     keywords), bucketed;
  *   - spike scan (:129-134): buckets with value < −0.3;
  *   - change scan (:136-149): adjacent-bucket delta with |Δ| ≥ 0.3 — the
  *     one lag() in the system (W3).
  */
object Trends {

  def dateKey(period: String): Column =
    if (period == "weekly") date_trunc("week", col("created_at"))
    else date_trunc("day", col("created_at"))

  /** P5 range filter: null created_at drops the row. */
  def filterRange(docs: DataFrame, start: Option[java.sql.Timestamp],
      end: Option[java.sql.Timestamp]): DataFrame = {
    var d = docs.filter(col("created_at").isNotNull)
    start.foreach(s => d = d.filter(col("created_at") >= date_trunc("day", lit(s))))
    end.foreach(e => d = d.filter(
      col("created_at") <= date_trunc("day", lit(e)) + expr("INTERVAL 23 HOURS 59 MINUTES 59 SECONDS")))
    d
  }

  /** A8: per-bucket average sentiment + count, date-ordered. Input must be
    * sentiment-scored (Sentiment.withSentiment).
    */
  def sentimentTrend(scored: DataFrame, period: String = "daily",
      start: Option[java.sql.Timestamp] = None,
      end: Option[java.sql.Timestamp] = None): DataFrame =
    filterRange(scored, start, end)
      .groupBy(dateKey(period).as("date"))
      .agg(avg(col("sentiment_score")).as("value"), count(lit(1)).as("count"))
      .orderBy("date")

  /** Keyword mention trend: containment over lower(title+' '+body). */
  def keywordTrend(docs: DataFrame, keyword: String, period: String = "daily"): DataFrame =
    docs.filter(col("created_at").isNotNull)
      .filter(lower(concat_ws(" ", col("title"), Sentiment.bodyCol))
        .contains(keyword.toLowerCase))
      .groupBy(dateKey(period).as("date"))
      .agg(count(lit(1)).cast("double").as("value"), count(lit(1)).as("count"))
      .orderBy("date")

  /** Issue mention trend: any of the issue's keywords contained. */
  def issueTrend(docs: DataFrame, keywords: Seq[String], period: String = "daily"): DataFrame = {
    val text = lower(concat_ws(" ", col("title"), Sentiment.bodyCol))
    val anyKw = keywords.map(k => text.contains(k.toLowerCase)).reduce(_ || _)
    docs.filter(col("created_at").isNotNull).filter(anyKw)
      .groupBy(dateKey(period).as("date"))
      .agg(count(lit(1)).cast("double").as("value"), count(lit(1)).as("count"))
      .orderBy("date")
  }

  /** W5: spike buckets (value < threshold). */
  def spikes(trend: DataFrame, threshold: Double = -0.3): DataFrame =
    trend.filter(col("value") < threshold)

  /** W3: adjacent-bucket deltas with |Δ| ≥ threshold. The global
    * orderBy-date window is single-partition by construction — trend
    * tables are one row per bucket, bounded by the date range, so this
    * never shuffles meaningful volume.
    */
  def changes(trend: DataFrame, threshold: Double = 0.3): DataFrame = {
    val w = Window.orderBy(col("date"))
    trend
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("change", col("value") - col("prev_value"))
      .filter(col("prev_value").isNotNull && abs(col("change")) >= threshold)
  }

  /** A9: two-period comparison (trend_analyzer.py:178-204). */
  def comparePeriods(scored: DataFrame,
      p1: (java.sql.Timestamp, java.sql.Timestamp),
      p2: (java.sql.Timestamp, java.sql.Timestamp)): (Double, Double, Double) = {
    def avgOf(r: (java.sql.Timestamp, java.sql.Timestamp)): Double = {
      val row = filterRange(scored, Some(r._1), Some(r._2))
        .agg(avg(col("sentiment_score"))).head()
      if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    }
    val (a, b) = (avgOf(p1), avgOf(p2))
    (a, b, b - a)
  }
}
