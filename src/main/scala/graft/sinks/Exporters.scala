package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Export sinks re-expressing the reference's exporter family
  * (/root/reference/crawler/exporters/): JSON (S7), CSV posts+comments pair
  * (S8), date-partitioned store (S9), QuickSight 4-table export (S11).
  * All are projections + DataFrameWriter dispatch — the reference's
  * ExporterFactory (exporters.py:196-227) becomes the `format` argument.
  */
object Exporters {

  /** Flat post projection (no nested spans) shared by the sinks. */
  def flatPosts(view: DataFrame): DataFrame =
    view.select(
      col("doc_id").as("url"), col("title"), col("body"), col("site"),
      col("keyword"), col("author"), col("created_at"),
      col("view_count"), col("like_count"), col("comment_count"))

  /** S7: JSON array export → one JSON lines dir (df.write.json). */
  def writeJson(view: DataFrame, path: String): Unit =
    flatPosts(view).write.mode(SaveMode.Overwrite).json(path)

  /** Exploded comment rows with the reference's full comment metadata
    * (post_url, author, content, created_at, like_count — CSVExporter
    * fieldnames, exporters.py:176). `comment_idx` (position within the
    * post) is carried for deterministic downstream ordering.
    */
  def flatComments(view: DataFrame): DataFrame =
    view.select(col("seq"), col("doc_id").as("post_url"),
        posexplode(col("comments")).as(Seq("comment_idx", "c")))
      .select(col("seq"), col("post_url"), col("comment_idx"),
        col("c.author").as("author"), col("c.content").as("content"),
        coalesce(col("c.createdAt"), lit("")).as("created_at"),
        col("c.likeCount").as("like_count"))

  /** S8: CSV pair — posts with derived comment_count, plus comments
    * exploded with the post_url FK and full metadata (exporters.py:89-195).
    */
  def writeCsv(view: DataFrame, postsPath: String, commentsPath: String): Unit = {
    flatPosts(view).write.mode(SaveMode.Overwrite).option("header", "true").csv(postsPath)
    flatComments(view)
      .select("post_url", "author", "content", "created_at", "like_count")
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(commentsPath)
  }

  /** S9: date-partitioned store — partition by crawl date with the
    * reference's "unknown" bucket for null dates (data_store.py:99-136).
    */
  def writeByDate(view: DataFrame, path: String): Unit =
    flatPosts(view)
      .withColumn("dt", coalesce(date_format(col("created_at"), "yyyy-MM-dd"), lit("unknown")))
      .write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(path)

  /** S11: QuickSight-style 4-table CSV export — posts (body truncated to
    * 1000 chars, quicksight_exporter.py:149), comments with the
    * reference's fieldnames (comment_id, post_url, author, content[:500],
    * created_at, like_count, game_id — :179-183; the dense sequential
    * comment_id is assigned with the scalable two-pass sequencer, not a
    * global window), per-post sentiment, issues with pipe-joined keywords
    * (:344-372) and yyyy-MM-dd dates (:401-413).
    */
  def writeQuickSight(view: DataFrame, issues: DataFrame, dir: String,
      gameId: String = "all"): Unit = {
    flatPosts(view)
      .withColumn("body", substring(col("body"), 1, 1000))
      .withColumn("created_at", date_format(col("created_at"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/posts")
    val (seqd, _, cache) = graft.pipeline.Sequencer.addSeq(
      flatComments(view), Seq(col("seq"), col("comment_idx")), "cseq")
    seqd
      .select(concat(lit(s"${gameId}_c"), col("cseq")).as("comment_id"),
        col("post_url"), col("author"),
        substring(col("content"), 1, 500).as("content"),
        col("created_at"), col("like_count"), lit(gameId).as("game_id"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/comments")
    cache.unpersist()
    view.select(col("doc_id").as("post_url"), col("sentiment_score"),
        col("sentiment_label"), col("sentiment_confidence"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/sentiment")
    // reference issues.csv fieldnames (quicksight_exporter.py:343-348)
    issues
      .select(col("issue_id"), col("title"),
        concat_ws("|", col("keywords")).as("keywords"),
        round(col("priority_score"), 4).as("priority_score"),
        col("is_hot"), col("is_bug"), col("severity"), col("post_count"),
        col("total_views"), col("total_comments"),
        round(col("sentiment_avg"), 4).as("sentiment_avg"),
        date_format(col("first_seen"), "yyyy-MM-dd").as("first_seen"),
        lit(gameId).as("game_id"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/issues")
  }
}
