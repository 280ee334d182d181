package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One alert row (the reference's Alert,
  * /root/reference/crawler/analysis/alert_manager.py:46-96). Deterministic
  * ids; `now` is an explicit parameter (the reference uses datetime.now(),
  * alert_manager.py:297 — injecting it keeps the engine reproducible).
  */
final case class AlertRow(
    alert_id: String,
    alert_type: String, // hot_issue | sentiment_spike | urgent
    priority: String,   // critical | high | medium | low
    title: String,
    message: String,
    created_at: String, // ISO of the injected `now` (reference: datetime.now())
    game_id: String,
    related_posts: Seq[String],
    related_issue_id: String,
    is_urgent: Boolean,
    /** The reference Alert's free-form metadata dict (alert_manager.py:
      * 178-183, 230-234, 275-280), values stringified for a stable Spark
      * schema: hot → post_count/total_views/priority_score/sentiment_avg;
      * spike → spike_date/sentiment_value/post_count; urgent adds
      * post_count_in_period/hours/is_bug.
      */
    metadata: Map[String, String])

/** Alert generation re-expressing the reference's AlertManager
  * (/root/reference/crawler/analysis/alert_manager.py):
  *
  *   - hot-issue alerts from the hot issue set (:358-436 via W1);
  *   - urgent classification (:286-324): ≥10 of an issue's related posts
  *     created within 24 h of `now` (J5 — semi-join + range predicate);
  *   - sentiment-spike alerts from trend buckets < −0.3 (:113, W5);
  *   - ordering: priority rank then creation order (:426-433, O7).
  */
object Alerts {

  val UrgentHours = 24
  val UrgentMinPosts = 10
  val SpikeThreshold = -0.3

  private val prioRank = Map("critical" -> 0, "high" -> 1, "medium" -> 2, "low" -> 3)

  /** J5: count each issue's related posts within the urgent window.
    * Distributed: explode issue→related url, semi-join docs on doc_id with
    * the time predicate, count per issue.
    */
  def urgentCounts(spark: SparkSession, docs: DataFrame, issues: Seq[Issue],
      now: java.sql.Timestamp): Map[String, Long] = {
    import spark.implicits._
    if (issues.isEmpty) return Map.empty
    val rel = issues.flatMap(i => i.related_posts.map(u => (i.issue_id, u)))
      .toDF("issue_id", "doc_id")
    val cutoff = new java.sql.Timestamp(now.getTime - UrgentHours * 3600L * 1000L)
    docs.filter($"created_at".isNotNull && $"created_at" >= lit(cutoff))
      .select($"doc_id")
      .join(rel, Seq("doc_id"))
      .groupBy($"issue_id").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
  }

  def generate(spark: SparkSession, docs: DataFrame, issues: Seq[Issue],
      scored: DataFrame, gameId: String, now: java.sql.Timestamp): Vector[AlertRow] = {
    val urgent = urgentCounts(spark, docs, issues, now)
    val createdAt = now.toLocalDateTime
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))

    val hotAlerts = issues.filter(_.is_hot).zipWithIndex.map { case (i, k) =>
      val inWindow = urgent.getOrElse(i.issue_id, 0L)
      val isUrgent = inWindow >= UrgentMinPosts
      val meta = Map(
        "post_count" -> i.post_count.toString,
        "total_views" -> i.total_views.toString,
        "priority_score" -> i.priority_score.toString,
        "sentiment_avg" -> i.sentiment_avg.toString) ++
        // the reference's separate URGENT alert carries the window counts
        // (alert_manager.py:275-280); here urgency is a flag on the hot
        // alert, so its metadata is merged in when it fires
        (if (isUrgent) Map(
          "post_count_in_period" -> inWindow.toString,
          "hours" -> UrgentHours.toString,
          "is_bug" -> i.is_bug.toString)
        else Map.empty[String, String])
      AlertRow(
        alert_id = f"alert_hot_$k%04d",
        alert_type = "hot_issue",
        priority = if (isUrgent) "critical" else if (i.is_bug) "high" else "medium",
        title = s"Hot issue: ${i.title}",
        message = s"issue ${i.title} with ${i.post_count} posts, priority ${i.priority_score}",
        created_at = createdAt,
        game_id = gameId,
        related_posts = i.related_posts.take(10),
        related_issue_id = i.issue_id,
        is_urgent = isUrgent,
        metadata = meta)
    }

    val spikeRows = Trends.spikes(
      Trends.sentimentTrend(scored, "daily"), SpikeThreshold).collect()
    val spikeAlerts = spikeRows.toVector.zipWithIndex.map { case (r, k) =>
      val spikeDate = r.getTimestamp(0).toLocalDateTime.toLocalDate.toString
      AlertRow(
        alert_id = f"alert_spike_$k%04d",
        alert_type = "sentiment_spike",
        priority = "high",
        title = s"Negative sentiment spike on ${r.getTimestamp(0)}",
        message = s"avg sentiment ${r.getDouble(1)} over ${r.getLong(2)} posts",
        created_at = createdAt,
        game_id = gameId,
        related_posts = Seq.empty,
        related_issue_id = "",
        is_urgent = false,
        metadata = Map(
          "spike_date" -> spikeDate,
          "sentiment_value" -> r.getDouble(1).toString,
          "post_count" -> r.getLong(2).toString))
    }

    // O7: priority rank asc, then creation (generation) order — stable
    (hotAlerts.toVector ++ spikeAlerts).zipWithIndex
      .sortBy { case (a, idx) => (prioRank.getOrElse(a.priority, 9), idx) }
      .map(_._1)
  }

  /** A11: urgent/hot/spike/critical summary counts (alert_manager.py:476-508). */
  def summary(alerts: Seq[AlertRow]): Map[String, Int] = Map(
    "total" -> alerts.size,
    "urgent" -> alerts.count(_.is_urgent),
    "hot_issue" -> alerts.count(_.alert_type == "hot_issue"),
    "sentiment_spike" -> alerts.count(_.alert_type == "sentiment_spike"),
    "critical" -> alerts.count(_.priority == "critical"))
}
