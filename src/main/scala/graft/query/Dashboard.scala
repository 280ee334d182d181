package graft.query

import graft.analysis.Sentiment
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Filter criteria for the posts endpoints — the reference's DataFilter
  * criteria dict (/root/reference/crawler/utils/data_filter.py:136-150)
  * plus the dashboard's query params (dashboard/app.py:507-641).
  */
final case class PostFilters(
    gameIds: Seq[String] = Seq.empty,        // P4
    startDate: Option[java.sql.Timestamp] = None, // P5
    endDate: Option[java.sql.Timestamp] = None,
    sites: Seq[String] = Seq.empty,          // P6
    minViews: Option[Int] = None,            // P7
    minComments: Option[Int] = None,
    sentimentLabel: Option[String] = None,   // P8
    sentimentRange: Option[(Double, Double)] = None,
    bugOnly: Boolean = false)                // P9

/** The reference dashboard's ~17 REST endpoints re-expressed as DataFrame
  * functions over the span-docs table (/root/reference/dashboard/app.py).
  * Every function returns a lazy plan; Catalyst fuses the conjunctive
  * filters (P10) and pushes them into the parquet scan.
  */
object Dashboard {

  /** Derived flat view: title/body/comment_count/sentiment columns over the
    * span table (the dashboard's raw-dict access with .get defaults).
    */
  def postsView(docs: DataFrame): DataFrame =
    Sentiment.withSentiment(docs)
      .withColumn("comment_count", size(expr("filter(spans, s -> s.kind = 'comment')")))
      .withColumn("is_bug", graft.analysis.Issues.bugCol(col("title"), col("body")))

  /** P4..P9 conjunctive filter pipeline (P10): one AND-ed predicate. */
  def applyFilters(view: DataFrame, f: PostFilters): DataFrame = {
    var preds = Vector.empty[Column]
    if (f.gameIds.nonEmpty) {
      val ids = f.gameIds.map(_.toLowerCase)
      // keyword equality OR game id substring of title/body (data_filter.py:60-75)
      preds :+= ids.map(g =>
        lower(col("keyword")) === g ||
          lower(col("title")).contains(g) || lower(col("body")).contains(g))
        .reduce(_ || _)
    }
    if (f.startDate.isDefined || f.endDate.isDefined) {
      preds :+= col("created_at").isNotNull // null drops the row (P5)
      f.startDate.foreach(s => preds :+= (col("created_at") >= lit(s)))
      f.endDate.foreach(e => preds :+= (col("created_at") <= lit(e)))
    }
    if (f.sites.nonEmpty)
      preds :+= lower(col("site")).isin(f.sites.map(_.toLowerCase): _*)
    f.minViews.foreach(n => preds :+= (col("view_count") >= n))
    f.minComments.foreach(n => preds :+= (col("comment_count") >= n))
    f.sentimentLabel.foreach(l => preds :+= (col("sentiment_label") === l))
    f.sentimentRange.foreach { case (lo, hi) =>
      preds :+= col("sentiment_score").between(lo, hi) }
    if (f.bugOnly) preds :+= col("is_bug")
    if (preds.isEmpty) view else view.filter(preds.reduce(_ && _))
  }

  /** O3 sort: view_count | comment_count | sentiment | created_at, asc/desc.
    * The dashboard sorts null created_at as '' (app.py:449-459) — i.e.
    * nulls first ascending, last descending.
    */
  def sortPosts(df: DataFrame, by: String, desc: Boolean): DataFrame =
    df.orderBy(sortKeysFor(by, desc): _*) // seq = stable tiebreak (list order)

  /** O5 pagination: offset via row_number over the EXPLICIT sort keys (no
    * native DF offset). limit(offset+limit) plans as TakeOrderedAndProject;
    * the window then re-ranks only those offset+limit rows by the same
    * keys — plan-stable, unlike numbering by monotonically_increasing_id.
    */
  def paginate(sorted: DataFrame, sortKeys: Seq[Column], offset: Int, limit: Int): DataFrame = {
    if (offset <= 0) return sorted.limit(limit)
    val w = Window.orderBy(sortKeys: _*)
    sorted.limit(offset + limit)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > offset).drop("__rn")
  }

  /** Convenience overload matching sortPosts' ordering. */
  def paginatePosts(view: DataFrame, by: String, desc: Boolean,
      offset: Int, limit: Int): DataFrame = {
    val keys = sortKeysFor(by, desc)
    paginate(view.orderBy(keys: _*), keys, offset, limit)
  }

  private[graft] def sortKeysFor(by: String, desc: Boolean): Seq[Column] = {
    val c = by match {
      case "comment_count" => col("comment_count")
      case "sentiment"     => col("sentiment_score")
      case "created_at"    => col("created_at")
      case _               => col("view_count")
    }
    Seq(if (desc) c.desc_nulls_last else c.asc_nulls_first, col("seq"))
  }

  /** GET /api/games (A7): per-keyword rollup, post_count desc. */
  def games(view: DataFrame): DataFrame =
    view.groupBy(col("keyword").as("game_id"))
      .agg(
        count(lit(1)).as("post_count"),
        sum("view_count").as("total_views"),
        sum("comment_count").as("total_comments"),
        max("created_at").as("last_crawled"),
        collect_set("site").as("sites"))
      .orderBy(col("post_count").desc, col("game_id"))

  /** GET /api/stats (A6): global totals + per-site + per-date counts. */
  def stats(view: DataFrame): (org.apache.spark.sql.Row, DataFrame, DataFrame) = {
    val totals = view.agg(
      count(lit(1)).as("total_posts"),
      sum("comment_count").as("total_comments"),
      sum("view_count").as("total_views"),
      sum("like_count").as("total_likes")).head()
    val bySite = view.groupBy("site").count().orderBy(col("count").desc, col("site"))
    val byDate = view.filter(col("created_at").isNotNull)
      .groupBy(to_date(col("created_at")).as("date")).count().orderBy("date")
    (totals, bySite, byDate)
  }

  /** GET /post/<url>: point lookup by canonical url (app.py:243-258). */
  def postByUrl(view: DataFrame, url: String): DataFrame =
    view.filter(col("doc_id") === graft.core.UrlCanon.canonicalize(url))

  /** GET /sentiment negative list (O4): most negative first + limit. */
  def negativePosts(view: DataFrame, threshold: Double = -0.3, limit: Int = 10): DataFrame =
    view.filter(col("sentiment_score") < threshold)
      .orderBy(col("sentiment_score").asc, col("seq")).limit(limit)
}
