package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-level analysis result (the reference's GameAnalysisResult,
  * /root/reference/crawler/models/analysis_models.py:283-330).
  */
final case class GameAnalysis(
    game_id: String,
    total_posts: Long,
    total_comments: Long,
    sentiment_distribution: Map[String, Long],
    sentiment_avg: Double,
    issues: Vector[Issue],
    hot_issues: Vector[Issue],
    bug_issues: Vector[Issue],
    alerts: Vector[AlertRow])

/** The reference's GameAnalyzer.analyze pipeline
  * (/root/reference/crawler/analysis/game_analyzer.py:88-163), §3.3:
  * sentiment distribution + average → issue detection → hot issues → bug
  * issues (severity rank then priority desc, issue_detector.py:567-577) →
  * alerts. One pass computes the scored+keyworded view; every aggregate
  * reuses it (the reference recomputes sentiment per stage — here the
  * column is materialized once).
  */
object GameAnalyzer {

  private val sevRank = Map("critical" -> 0, "high" -> 1, "medium" -> 2, "low" -> 3)

  def analyze(spark: SparkSession, docs: DataFrame, gameId: String,
      now: java.sql.Timestamp): GameAnalysis = {
    import spark.implicits._
    val scored = Keywords.withPostKeywords(Sentiment.withSentiment(docs)).persist()

    val totals = scored.agg(
      count(lit(1)),
      sum(size(expr("filter(spans, s -> s.kind = 'comment')")))).head()
    val nPosts = totals.getLong(0)
    val nComments = if (totals.isNullAt(1)) 0L else totals.getLong(1)

    val dist = Sentiment.distribution(scored).as[(String, Long)].collect().toMap
    val avgScore = Sentiment.average(scored)

    val issues = Issues.detectIssues(spark, scored)
    val hot = issues.filter(_.is_hot)
    val bugs = issues.filter(_.is_bug)
      .sortBy(i => (sevRank.getOrElse(i.severity, 9), -i.priority_score))

    val alerts = Alerts.generate(spark, scored, issues, scored, gameId, now)
    scored.unpersist()

    GameAnalysis(gameId, nPosts, nComments, dist, avgScore, issues, hot, bugs, alerts)
  }
}
