package graft.pipeline

import graft.core._
import graft.fetch.SearchManager
import graft.snapshot.SnapshotStore

import org.apache.spark.sql.SparkSession

/** The profile-driven crawl spine — the reference orchestrator's
  * crawl_game / crawl_game_by_id (/root/reference/crawler/orchestrator.py:
  * 483-561): resolve the game's profile, ensure its directories, acquire
  * seeds for the profile's keywords × target sites through the failover
  * search manager, run the crawl into the game's data directory, then
  * auto-analyze and export the QuickSight tables into the game's
  * quicksight directory.
  */
object GameRunner {

  final case class GameCrawlResult(
      gameId: String,
      dataDir: String,
      quicksightDir: String,
      scheduled: Long,
      docs: Long)

  /** crawl_game_by_id: None when the game has no registered profile
    * (orchestrator.py:550-555); otherwise delegates to crawlGame.
    */
  def crawlGameById(spark: SparkSession, manager: GameProfileManager,
      search: SearchManager, gameId: String, config: CrawlConfig,
      now: java.sql.Timestamp, autoAnalyze: Boolean = true): Option[GameCrawlResult] =
    manager.getProfile(gameId).map(p =>
      crawlGame(spark, manager, search, p, config, now, autoAnalyze))

  /** crawl_game: register-if-absent, ensure directories, seed → crawl →
    * (optionally) analyze + export, everything routed by the profile.
    */
  def crawlGame(spark: SparkSession, manager: GameProfileManager,
      search: SearchManager, profile: GameProfile, config: CrawlConfig,
      now: java.sql.Timestamp, autoAnalyze: Boolean = true): GameCrawlResult = {
    import spark.implicits._
    if (manager.getProfile(profile.game_id).isEmpty) manager.registerGame(profile)
    manager.ensureDirectories(profile.game_id)
    val dataDir = manager.getDataPath(profile.game_id)
    val qsDir = manager.getQuicksightPath(profile.game_id)

    // S1-S3: per-(site, keyword) failover search, canonical seed order
    val seeds = graft.fetch.SeedSource.acquire(search, profile.target_sites,
      profile.keywords, config.maxResultsPerSite)

    val crawler = new Crawler(spark, config, dataDir)
    crawler.run(spark.createDataset(seeds))

    val store = new SnapshotStore(dataDir)
    val docs = store.read(spark, "docs")
    val nDocs = docs.map(_.count()).getOrElse(0L)

    if (autoAnalyze) docs.foreach { d =>
      val view = graft.query.Dashboard.postsView(d).persist()
      val issues = spark.createDataset(
        graft.analysis.Issues.detectIssues(spark,
          graft.analysis.Keywords.withPostKeywords(view))).toDF()
      graft.sinks.Exporters.writeQuickSight(view, issues, qsDir,
        gameId = profile.game_id)
      view.unpersist()
    }

    GameCrawlResult(profile.game_id, dataDir, qsDir, crawler.totalScheduled, nDocs)
  }
}
