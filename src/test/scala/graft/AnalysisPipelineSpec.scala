package graft

import graft.analysis._
import graft.core.{CrawlConfig, GameProfile, GameProfileManager, Span, UrlCanon}
import graft.pipeline.GameRunner
import graft.fixtures.Fixtures
import graft.parse.PageParser
import graft.query.{Dashboard, PostFilters}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

final case class TestDoc(
    round: Int, seq: Long, doc_id: String, url: String, site: String,
    keyword: String, title: String, author: String,
    created_at: java.sql.Timestamp, view_count: Int, like_count: Int,
    spans: Seq[Span], outlinks: Seq[String],
    comments: Seq[graft.core.ParsedComment])

/** Distributed analysis layer vs driver-side replicas of the reference
  * semantics, over a parsed fixture corpus (no crawl needed — parse is
  * deterministic per URL).
  */
class AnalysisPipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val parsed: Vector[(Long, String, PageParser.type => Unit)] = Vector.empty

  lazy val docsLocal: Vector[TestDoc] = {
    var seq = 0L
    val out = Vector.newBuilder[TestDoc]
    (0 until 300).foreach { i =>
      val h = Fixtures.mix(55L, i.toLong)
      val host = Fixtures.pickSite(h)
      val url = Fixtures.cleanUrl(host, Fixtures.bounded(Fixtures.mix(h, 1L), 4),
        Fixtures.bounded(Fixtures.mix(h, 2L), 1000))
      val canon = UrlCanon.canonicalize(url)
      PageParser.parse(Fixtures.html(canon), canon).foreach { p =>
        out += TestDoc(0, seq, canon, url, host,
          Fixtures.Keywords(i % 3), p.title, p.author,
          p.createdAt.map(java.sql.Timestamp.valueOf).orNull,
          p.viewCount, p.likeCount, p.spans, p.outlinks, p.comments)
        seq += 1
      }
    }
    out.result().distinct.groupBy(_.doc_id).map(_._2.head).toVector.sortBy(_.seq)
  }

  lazy val docs: DataFrame = spark.createDataset(docsLocal).toDF().cache()
  lazy val scored: DataFrame =
    Keywords.withPostKeywords(Sentiment.withSentiment(docs)).cache()

  private def bodyOf(d: TestDoc): String =
    d.spans.filter(_.kind == "body").map(_.text).mkString("\n")
  private def commentsOf(d: TestDoc): Seq[String] =
    d.spans.filter(_.kind == "comment").map(_.text)

  test("Spark sentiment columns equal the pure-function reference semantics") {
    val got = scored.select($"doc_id", $"sentiment_score", $"sentiment_blended")
      .as[(String, Double, Double)].collect().map { case (k, s, b) => k -> (s, b) }.toMap
    docsLocal.foreach { d =>
      val want = Sentiment.postScore(d.title, bodyOf(d))
      val wantB = Sentiment.postWithCommentsScore(d.title, bodyOf(d), commentsOf(d))
      assert(got(d.doc_id)._1 == want, s"score mismatch for ${d.doc_id}")
      assert(got(d.doc_id)._2 == wantB, s"blend mismatch for ${d.doc_id}")
    }
  }

  test("distributed corpus top keywords == driver Counter replica (A1 incl. tie order)") {
    // driver replica: Counter.update over per-post top-100 lists
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    docsLocal.foreach { d =>
      Keywords.extractFromPost(d.title, bodyOf(d), commentsOf(d), 100)
        .foreach(kw => counts.updateWith(kw) { case Some(c) => Some(c + 1); case None => Some(1) })
    }
    val want = counts.toVector.zipWithIndex
      .sortBy { case ((_, c), i) => (-c, i) }.take(50).map(_._1._1)
    val got = Keywords.corpusTopKeywords(scored, 50).select("keyword").as[String].collect().toVector
    assert(got == want)
  }

  test("issue detection invariants: coverage, hot decile, priority range") {
    val issues = Issues.detectIssues(spark, scored)
    assert(issues.nonEmpty)
    val allKws = issues.flatMap(_.keywords)
    assert(allKws.distinct.size == allKws.size, "keyword in more than one cluster")
    assert(issues.count(_.is_hot) == math.max(1, (issues.size * 0.1).toInt))
    issues.foreach { i =>
      assert(i.priority_score >= 0.0 && i.priority_score <= 1.0)
      assert(i.sentiment_avg >= -1.0 && i.sentiment_avg <= 1.0)
      assert(Set("critical", "high", "medium", "low").contains(i.severity))
    }
    // priority ordering is descending
    assert(issues.map(_.priority_score) == issues.map(_.priority_score).sortBy(-_))
    // related posts belong to the corpus and contain the cluster keywords
    val ids = docsLocal.map(_.doc_id).toSet
    issues.foreach(i => assert(i.related_posts.forall(ids)))
  }

  test("cluster stats match driver replica for the top cluster") {
    val issues = Issues.detectIssues(spark, scored)
    val top = issues.head
    val kwSet = top.keywords.toSet
    val related = docsLocal.filter { d =>
      Keywords.extractFromPost(d.title, bodyOf(d), commentsOf(d), 100).exists(kwSet)
    }
    assert(top.post_count == related.size)
    assert(top.total_views == related.map(_.view_count.toLong).sum)
    assert(top.total_comments == related.map(d => commentsOf(d).size.toLong).sum)
    assert(top.related_posts.toSet == related.map(_.doc_id).toSet)
  }

  test("hot posts: top-k by weighted score, k = min(topN, max(1, n/10))") {
    val hot = Issues.detectHotPosts(spark, scored, topN = 20).collect()
    val n = docsLocal.size
    assert(hot.length == math.min(20, math.max(1, (n * 0.1).toInt)))
    val scores = hot.map(_.getAs[Double]("hot_score"))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  test("weekly trend buckets are Mondays; daily counts cover all dated docs") {
    val weekly = Trends.sentimentTrend(scored, "weekly").collect()
    weekly.foreach { r =>
      val d = r.getTimestamp(0).toLocalDateTime
      assert(d.getDayOfWeek == java.time.DayOfWeek.MONDAY)
    }
    val daily = Trends.sentimentTrend(scored, "daily").collect()
    assert(daily.map(_.getLong(2)).sum == docsLocal.count(_.created_at != null))
    // per-bucket average matches driver replica
    val wantDaily = docsLocal.filter(_.created_at != null)
      .groupBy(d => d.created_at.toLocalDateTime.toLocalDate)
      .view.mapValues(ds => ds.map(d => Sentiment.postScore(d.title, bodyOf(d))).sum / ds.size)
    daily.foreach { r =>
      val k = r.getTimestamp(0).toLocalDateTime.toLocalDate
      assert(math.abs(r.getDouble(1) - wantDaily(k)) < 1e-12)
    }
  }

  test("spike and change scans (W5/W3)") {
    val trend = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.2, 3L),
      (java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), -0.4, 2L),
      (java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), -0.05, 4L))
      .toDF("date", "value", "count")
    assert(Trends.spikes(trend).collect().map(_.getDouble(1)).toSeq == Seq(-0.4))
    val ch = Trends.changes(trend).orderBy("date").collect()
    assert(ch.map(_.getAs[Double]("change")).toSeq == Seq(-0.6000000000000001, 0.35000000000000003))
  }

  test("dashboard filters + sort + pagination match driver replica") {
    val view = Dashboard.postsView(docs).cache()
    val f = PostFilters(sites = Seq(Fixtures.Hosts.head.toUpperCase), minViews = Some(10000))
    val got = Dashboard.applyFilters(view, f).count()
    val want = docsLocal.count(d => d.site == Fixtures.Hosts.head && d.view_count >= 10000)
    assert(got == want)

    val sorted = Dashboard.sortPosts(view, "view_count", desc = true)
      .select("view_count").as[Int].collect().toSeq
    assert(sorted == sorted.sortBy(-(_: Int)))

    val page2 = Dashboard.paginatePosts(view, "view_count", desc = true, 10, 10)
      .select("view_count").as[Int].collect().toSeq
    assert(page2 == sorted.slice(10, 20))

    // game filter P4 semantics
    val g = Dashboard.applyFilters(view, PostFilters(gameIds = Seq("LOSTARK"))).count()
    val wantG = docsLocal.count(d => d.keyword.toLowerCase == "lostark" ||
      d.title.toLowerCase.contains("lostark") || bodyOf(d).toLowerCase.contains("lostark"))
    assert(g == wantG)
  }

  test("games rollup (A7) matches driver replica") {
    val view = Dashboard.postsView(docs)
    val got = Dashboard.games(view).as[(String, Long, Long, Long, java.sql.Timestamp, Seq[String])]
      .collect()
    val want = docsLocal.groupBy(_.keyword)
    got.foreach { case (gid, cnt, views, comments, last, sites) =>
      val ds = want(gid)
      assert(cnt == ds.size)
      assert(views == ds.map(_.view_count.toLong).sum)
      assert(comments == ds.map(d => commentsOf(d).size.toLong).sum)
      assert(last == ds.map(_.created_at).maxBy(_.getTime))
      assert(sites.toSet == ds.map(_.site).toSet)
    }
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sortBy(-(_: Long)))
  }

  test("alerts: urgent requires >=10 related posts within 24h of now") {
    val issues = Issues.detectIssues(spark, scored)
    // choose `now` far in the future → nothing urgent
    val farFuture = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val a1 = Alerts.generate(spark, scored, issues, scored, "lostark", farFuture)
    assert(a1.forall(!_.is_urgent))
    // choose `now` = corpus max date → urgency possible for big clusters
    val maxDate = docsLocal.map(_.created_at).maxBy(_.getTime)
    val a2 = Alerts.generate(spark, scored, issues, scored, "lostark", maxDate)
    val counts = Alerts.urgentCounts(spark, scored, issues, maxDate)
    a2.filter(_.alert_type == "hot_issue").foreach { a =>
      val want = counts.getOrElse(a.related_issue_id, 0L) >= Alerts.UrgentMinPosts
      assert(a.is_urgent == want)
    }
    // ordering: priority rank ascending
    val ranks = a2.map(a => Map("critical" -> 0, "high" -> 1, "medium" -> 2, "low" -> 3)(a.priority))
    assert(ranks == ranks.sorted)
    // full reference field set (alert_manager.py:46-63): created_at stamps
    // the injected now; metadata carries the per-type dict
    a2.foreach { a =>
      assert(a.created_at == maxDate.toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
      a.alert_type match {
        case "hot_issue" =>
          assert(Set("post_count", "total_views", "priority_score", "sentiment_avg")
            .subsetOf(a.metadata.keySet))
          val issue = issues.find(_.issue_id == a.related_issue_id).get
          assert(a.metadata("post_count") == issue.post_count.toString)
          if (a.is_urgent)
            assert(Set("post_count_in_period", "hours", "is_bug").subsetOf(a.metadata.keySet))
        case "sentiment_spike" =>
          assert(Set("spike_date", "sentiment_value", "post_count") == a.metadata.keySet)
        case other => fail(s"unexpected alert_type $other")
      }
    }
  }

  test("profile-driven crawl routes outputs under the game's directories") {
    val base = tempDir("graft-games")
    val mgr = new GameProfileManager(s"$base/data", s"$base/qs")
    // validation mirrors game_profile.py __post_init__ ValueErrors
    intercept[IllegalArgumentException](GameProfile("", "G", Seq("k"), Seq("s")))
    intercept[IllegalArgumentException](GameProfile("g", " ", Seq("k"), Seq("s")))
    intercept[IllegalArgumentException](GameProfile("g", "G", Seq.empty, Seq("s")))
    intercept[IllegalArgumentException](GameProfile("g", "G", Seq("k"), Seq.empty))

    val corpus = Fixtures.seeds(400)
    val adapter = new graft.fetch.FixtureSearchAdapter("fix", corpus)
    val search = new graft.fetch.SearchManager(IndexedSeq(adapter))
    val profile = GameProfile("lostark", "Lost Ark",
      keywords = Seq("lostark"), target_sites = Fixtures.Hosts.take(6))
    // by-id before registration → None (orchestrator.py:550-555)
    val cfg = CrawlConfig(maxRounds = 1, seenPartitions = 4,
      bloomExpectedPerPartition = 10000L)
    val now = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    assert(GameRunner.crawlGameById(spark, mgr, search, "lostark", cfg, now).isEmpty)

    val res = GameRunner.crawlGame(spark, mgr, search, profile, cfg, now)
    assert(res.dataDir == s"$base/data/lostark" && res.quicksightDir == s"$base/qs/lostark")
    assert(res.scheduled > 0 && res.docs > 0)
    // snapshot store and quicksight tables land under the game's dirs
    assert(new java.io.File(s"$base/data/lostark/data/docs").exists())
    for (t <- Seq("posts", "comments", "sentiment", "issues"))
      assert(new java.io.File(s"$base/qs/lostark/$t").exists(), t)
    // registered now; by-id resolves and game_id stamps the export
    assert(mgr.getProfile("lostark").contains(profile))
    val qsIssues = spark.read.option("header", "true").csv(s"$base/qs/lostark/issues")
    assert(qsIssues.select("game_id").distinct().as[String].collect().toSeq == Seq("lostark"))
  }

  test("exporters round-trip: flat posts, exploded comments, quicksight") {
    val dir = tempDir("graft-export")
    val view = Dashboard.postsView(docs)
    graft.sinks.Exporters.writeJson(view, s"$dir/json")
    assert(spark.read.json(s"$dir/json").count() == docsLocal.size)
    graft.sinks.Exporters.writeCsv(view, s"$dir/posts", s"$dir/comments")
    val posts = spark.read.option("header", "true").csv(s"$dir/posts")
    // reference CSVExporter fieldnames, exporters.py:144-147
    assert(posts.columns.toSeq == Seq("url", "title", "body", "site", "keyword",
      "author", "created_at", "view_count", "like_count", "comment_count"))
    val comments = spark.read.option("header", "true").csv(s"$dir/comments")
    assert(comments.count() == docsLocal.map(d => commentsOf(d).size.toLong).sum)
    // reference comment fieldnames incl. metadata, exporters.py:176
    assert(comments.columns.toSeq ==
      Seq("post_url", "author", "content", "created_at", "like_count"))
    val wantAuthors = docsLocal.flatMap(_.comments.map(_.author)).sorted
    val gotAuthors = comments.select("author").as[String].collect().toVector.sorted
    assert(gotAuthors == wantAuthors)
    val wantLikes = docsLocal.flatMap(_.comments.map(_.likeCount.toLong)).sum
    assert(comments.agg(sum($"like_count".cast("long"))).head().getLong(0) == wantLikes)
    // comment created_at is REAL data now (fixture dates → parser ladder →
    // export), matching the reference Comment's carried metadata
    val wantDates = docsLocal.flatMap(_.comments.map(_.createdAt.getOrElse(""))).sorted
    assert(wantDates.exists(_.nonEmpty), "fixture comments should carry dates")
    val gotDates = comments.select("created_at").as[String].collect().toVector.sorted
    assert(gotDates == wantDates)
    assert(gotDates.filter(_.nonEmpty)
      .forall(_.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}""")))
    graft.sinks.Exporters.writeByDate(view, s"$dir/bydate")
    val bydate = spark.read.parquet(s"$dir/bydate")
    assert(bydate.count() == docsLocal.size)
    assert(bydate.select("dt").distinct().count() > 1)
  }

  test("quicksight export: comment table carries reference fieldnames + dense ids") {
    val dir = tempDir("graft-qs")
    val view = Dashboard.postsView(docs)
    val issues = spark.createDataset(
      Issues.detectIssues(spark, Keywords.withPostKeywords(view))).toDF()
    graft.sinks.Exporters.writeQuickSight(view, issues, dir, gameId = "g1")
    val comments = spark.read.option("header", "true").csv(s"$dir/comments")
    assert(comments.columns.toSeq == Seq("comment_id", "post_url", "author",
      "content", "created_at", "like_count", "game_id"))
    val n = docsLocal.map(_.comments.size.toLong).sum
    assert(comments.count() == n)
    // dense deterministic ids g1_c0..g1_c{n-1} (quicksight_exporter.py:188)
    val ids = comments.select("comment_id").as[String].collect().toSet
    assert(ids == (0L until n).map(i => s"g1_c$i").toSet)
  }
}
