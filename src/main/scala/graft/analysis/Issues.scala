package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One detected issue (the reference's DetectedIssue,
  * /root/reference/crawler/models/analysis_models.py:111-161). issue ids
  * are deterministic (cluster index) rather than uuid4 — determinism is a
  * engine-wide invariant here.
  */
final case class Issue(
    issue_id: String,
    title: String,          // cluster representative
    keywords: Seq[String],
    post_count: Long,
    total_views: Long,
    total_comments: Long,
    priority_score: Double,
    is_hot: Boolean,
    is_bug: Boolean,
    severity: String,
    related_posts: Seq[String],
    first_seen: Option[java.sql.Timestamp],
    sentiment_avg: Double)

/** Issue detection re-expressing the reference's IssueDetector
  * (/root/reference/crawler/analysis/issue_detector.py):
  *
  *   1. corpus top-50 keywords (A1, distributed — Keywords.corpusTopKeywords);
  *   2. greedy first-match clustering against cluster representatives —
  *      ORDER-DEPENDENT (:106-168), so it runs sequentially on the driver
  *      over the collected ≤50 keywords, exactly as the reference does
  *      (SURVEY §3.3: clustering stays on the driver for parity);
  *   3. per-cluster stats distributed: a doc belongs to a cluster iff its
  *      top-100 keyword set intersects the cluster's keywords (:170-207) —
  *      explode both sides, equi-join on keyword, distinct (cluster, doc),
  *      then hash-aggregate counts/sums — no theta join needed;
  *   4. priority = 0.3·views/Σviews + 0.3·comments/Σcomments +
  *      0.4·count/N over GLOBAL totals (:209-257);
  *   5. is_bug: any cluster keyword equal to or containing a bug keyword
  *      (:477-481); severity ladder 0.7/0.5/0.3 on
  *      0.5·min(1, count/N) + 0.5·max(0, −sentiment) (:334-422);
  *   6. hot issues: top max(1, ⌊n·0.1⌋) by priority (stable order —
  *      :518-551).
  */
object Issues {

  /** The reference's BUG_KEYWORDS ported verbatim
    * (issue_detector.py:40-46, 29 terms).
    */
  val BugKeywords: Set[String] = Set(
    "버그", "오류", "에러", "렉", "튕김", "접속불가",
    "크래시", "프리징", "멈춤", "안됨", "불가", "안돼",
    "오작동", "작동안함", "실행안됨", "로딩", "무한로딩",
    "끊김", "팅김", "다운", "서버다운", "점검", "긴급점검",
    "bug", "error", "crash", "freeze", "lag")

  /** F11: char-set Jaccard keyword similarity (issue_detector.py:77-104). */
  def keywordSimilarity(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.contains(b) || b.contains(a)) return 0.8
    val (s1, s2) = (a.toSet, b.toSet)
    val union = (s1 | s2).size
    if (union == 0) 0.0 else (s1 & s2).size.toDouble / union
  }

  /** Greedy order-dependent clustering (issue_detector.py:106-168): each
    * keyword joins the best existing cluster whose REPRESENTATIVE (first
    * member) is ≥ threshold similar (strictly-greater tie-break keeps the
    * first best), else founds a new cluster. Returns ordered clusters.
    */
  def clusterKeywords(keywords: Seq[String], threshold: Double = 0.5): Vector[Vector[String]] = {
    val clusters = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[String]]
    keywords.foreach { kw =>
      var bestIdx = -1; var bestSim = 0.0
      clusters.zipWithIndex.foreach { case (c, i) =>
        val sim = keywordSimilarity(kw, c.head)
        if (sim >= threshold && sim > bestSim) { bestSim = sim; bestIdx = i }
      }
      if (bestIdx >= 0) clusters(bestIdx) += kw
      else clusters += scala.collection.mutable.ArrayBuffer(kw)
    }
    clusters.map(_.toVector).toVector
  }

  def isBugCluster(keywords: Seq[String]): Boolean =
    keywords.exists(kw =>
      BugKeywords.contains(kw.toLowerCase) ||
        BugKeywords.exists(b => kw.toLowerCase.contains(b)))

  def severityOf(score: Double): String =
    if (score >= 0.7) "critical" else if (score >= 0.5) "high"
    else if (score >= 0.3) "medium" else "low"

  /** Full issue detection over a scored+keyworded docs DataFrame (must have
    * seq, doc_id, view_count, created_at, spans, title, sentiment_score,
    * post_keywords). Returns issues ordered by priority desc (stable by
    * cluster index).
    */
  def detectIssues(spark: SparkSession, docs: DataFrame,
      topN: Int = 50, simThreshold: Double = 0.5,
      maxRelated: Int = 1000): Vector[Issue] = {
    import spark.implicits._

    val withKw = docs.persist()
    val totals = withKw.agg(
      count(lit(1)).as("n"),
      sum("view_count").as("views"),
      sum(size(expr("filter(spans, s -> s.kind = 'comment')"))).as("comments")).head()
    val nDocs = totals.getLong(0)
    if (nDocs == 0) return Vector.empty
    val totViews = math.max(totals.getLong(1), 1L)
    val totComments = math.max(totals.getLong(2), 1L)

    val top = Keywords.corpusTopKeywords(withKw, topN).select("keyword").as[String]
      .collect().toVector
    if (top.isEmpty) return Vector.empty

    val clusters = clusterKeywords(top, simThreshold)
    val clusterDF = clusters.zipWithIndex
      .flatMap { case (kws, i) => kws.map(kw => (i, kw)) }
      .toDF("cluster_idx", "keyword")

    // doc ∈ cluster iff top-100 keywords ∩ cluster keywords ≠ ∅
    val matches = withKw
      .select($"seq", $"doc_id", $"view_count", $"created_at", $"sentiment_score",
        size(expr("filter(spans, s -> s.kind = 'comment')")).as("n_comments"),
        explode($"post_keywords").as("keyword"))
      .join(broadcast(clusterDF), Seq("keyword"))
      .select($"cluster_idx", $"seq", $"doc_id", $"view_count", $"n_comments",
        $"created_at", $"sentiment_score")
      .distinct()

    // `related` is unbounded in corpus size (a hot cluster can match
    // millions of docs): rank within each cluster by crawl order and keep
    // only the first maxRelated BEFORE any list is materialized — the
    // window sort spills, a collect_list of the full cluster would not
    val wRel = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_idx").orderBy($"seq")
    val related = matches
      .withColumn("__rk", row_number().over(wRel)).filter($"__rk" <= maxRelated)
      .groupBy($"cluster_idx")
      .agg(sort_array(collect_list(struct($"seq", $"doc_id"))).as("related"))
    val stats = matches.groupBy($"cluster_idx").agg(
      count(lit(1)).as("post_count"),
      sum($"view_count").as("total_views"),
      sum($"n_comments").as("total_comments"),
      avg($"sentiment_score").as("sentiment_avg"),
      min($"created_at").as("first_seen"))
      .join(related, Seq("cluster_idx"))
      .collect()
      .map(r => r.getInt(0) -> r).toMap

    val issues = clusters.zipWithIndex.map { case (kws, i) =>
      val s = stats.get(i)
      val postCount = s.map(_.getLong(1)).getOrElse(0L)
      val views = s.map(_.getLong(2)).getOrElse(0L)
      val comments = s.map(_.getLong(3)).getOrElse(0L)
      val sentAvg = s.flatMap(r => Option(r.get(4)).map(_ => r.getDouble(4))).getOrElse(0.0)
      val firstSeen = s.flatMap(r => Option(r.getTimestamp(5)))
      val related = s.map(_.getSeq[org.apache.spark.sql.Row](6).map(_.getString(1)))
        .getOrElse(Seq.empty)
      val priority = 0.3 * views.toDouble / totViews +
        0.3 * comments.toDouble / totComments +
        0.4 * postCount.toDouble / nDocs
      val bug = isBugCluster(kws)
      val severity = if (bug)
        severityOf(0.5 * math.min(1.0, postCount.toDouble / math.max(nDocs, 1L)) +
          0.5 * math.max(0.0, -sentAvg))
      else "low"
      Issue(f"issue_$i%04d", kws.head, kws, postCount, views, comments, priority,
        is_hot = false, is_bug = bug, severity = severity,
        related_posts = related, first_seen = firstSeen, sentiment_avg = sentAvg)
    }

    // priority desc, stable by cluster index (Python sort stability)
    val sorted = issues.sortBy(i => (-i.priority_score, i.issue_id))
    val hotCount = math.max(1, (sorted.size * 0.1).toInt)
    sorted.zipWithIndex.map { case (iss, rank) =>
      if (rank < hotCount) iss.copy(is_hot = true) else iss
    }
  }

  /** W1 as a DataFrame op over an issues table (for large issue sets):
    * marks the top max(1, ⌊n·0.1⌋) by priority as hot without a driver
    * round-trip — single window over ≤ topN rows.
    */
  def markHot(issues: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("priority_score").desc, col("issue_id"))
    issues
      .withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("is_hot", col("__rank") <= greatest(lit(1), floor(col("__n") * 0.1)))
      .drop("__rank", "__n")
  }

  /** W2/O8: hot-post scoring and top-k (issue_detector.py:664-791):
    * hot = 0.4·min(views/max,1) + 0.3·min(comments/max,1) + 0.3·(1−s)/2,
    * top min(top_n, max(1, ⌊n·0.1⌋)). Global maxima via a single agg
    * broadcast into the projection (no global window).
    */
  def detectHotPosts(spark: SparkSession, docs: DataFrame, topN: Int = 20): DataFrame = {
    import spark.implicits._
    val kwU = udf((t: String, b: String, c: Seq[String]) =>
      Keywords.extractFromPost(t, b, c, 5))
    val m = docs.agg(
      greatest(max($"view_count"), lit(1)).as("max_views"),
      greatest(max(size(expr("filter(spans, s -> s.kind = 'comment')"))), lit(1)).as("max_comments"),
      count(lit(1)).as("n")).head()
    val (maxV, maxC, n) = (m.getInt(0).toLong, m.getInt(1).toLong, m.getLong(2))
    val k = math.min(math.max(1L, (n * 0.1).toLong), topN.toLong).toInt

    docs
      .withColumn("comment_count", size(expr("filter(spans, s -> s.kind = 'comment')")))
      .withColumn("hot_score",
        lit(0.4) * least($"view_count" / maxV.toDouble, lit(1.0)) +
          lit(0.3) * least($"comment_count" / maxC.toDouble, lit(1.0)) +
          lit(0.3) * ((lit(1.0) - $"sentiment_score") / 2.0))
      .withColumn("hot_score", least($"hot_score", lit(1.0)))
      .withColumn("is_bug", bugCol($"title", Sentiment.bodyCol))
      .withColumn("hp_severity",
        when(!$"is_bug", "low").otherwise(
          severityLadder($"hot_score" * 0.6 + greatest(lit(0.0), -$"sentiment_score") * 0.4)))
      .withColumn("top_keywords", kwU($"title", Sentiment.bodyCol, Sentiment.commentsCol))
      .orderBy($"hot_score".desc, $"seq")
      .limit(k)
  }

  /** P12: bug classification over title+body — exists() over a broadcast
    * literal keyword array, fully codegen'd (no UDF).
    */
  def bugCol(title: org.apache.spark.sql.Column, body: org.apache.spark.sql.Column) = {
    val text = lower(concat_ws(" ", title, body))
    BugKeywords.toSeq.sorted
      .map(kw => text.contains(lit(kw)))
      .reduce(_ || _)
  }

  private def severityLadder(score: org.apache.spark.sql.Column) =
    when(score >= 0.7, "critical").when(score >= 0.5, "high")
      .when(score >= 0.3, "medium").otherwise("low")
}
