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

  /** S8: CSV pair — posts with derived comment_count, plus comments
    * exploded with the post_url FK (exporters.py:89-195).
    */
  def writeCsv(view: DataFrame, postsPath: String, commentsPath: String): Unit = {
    flatPosts(view).write.mode(SaveMode.Overwrite).option("header", "true").csv(postsPath)
    view.select(col("doc_id").as("post_url"),
        posexplode(expr("filter(spans, s -> s.kind = 'comment')")).as(Seq("comment_idx", "c")))
      .select(col("post_url"), col("comment_idx"), col("c.text").as("content"))
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
    * 1000 chars, quicksight_exporter.py:149), comments, per-post sentiment,
    * issues with pipe-joined keywords (:344-372) and yyyy-MM-dd dates
    * (:401-413).
    */
  def writeQuickSight(view: DataFrame, issues: DataFrame, dir: String): Unit = {
    flatPosts(view)
      .withColumn("body", substring(col("body"), 1, 1000))
      .withColumn("created_at", date_format(col("created_at"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/posts")
    view.select(col("doc_id").as("post_url"),
        expr("filter(spans, s -> s.kind = 'comment')").as("cs"))
      .select(col("post_url"), posexplode(col("cs")).as(Seq("idx", "c")))
      .select(col("post_url"), col("c.text").as("content"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/comments")
    view.select(col("doc_id").as("post_url"), col("sentiment_score"),
        col("sentiment_label"), col("sentiment_confidence"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/sentiment")
    issues.withColumn("keywords", concat_ws("|", col("keywords")))
      .withColumn("first_seen", date_format(col("first_seen"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$dir/issues")
  }
}
