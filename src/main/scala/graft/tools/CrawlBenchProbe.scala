package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-timed replica of Bench's crawl section (guide §1): same seeds,
  * same config, ONE attempt, with GRAFT_TIMING-style per-stage prints from
  * the Crawler (set GRAFT_TIMING=1) — for finding where the crawl's wall
  * time goes without touching the frozen Bench harness.
  */
object CrawlBenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nSeeds = args.headOption.map(_.toLong).getOrElse(6250L * cpus.toInt)
    val attempts = if (args.length > 1) args(1).toInt else 1
    val seeds = spark.range(nSeeds)
      .map(i => graft.fixtures.Fixtures.benchSeed(i, postRange = 200000, nHosts = 1024))
    val cfg = graft.core.CrawlConfig(maxRounds = 2, seenPartitions = cpus.toInt,
      saltFactor = 32, bloomExpectedPerPartition = 2000000L,
      eagerCheckpointFree = true)
    (1 to attempts).foreach { a =>
      val store = java.nio.file.Files.createTempDirectory("graft-crawlprobe").toString
      val t0 = System.nanoTime()
      new graft.pipeline.Crawler(spark, cfg, store).run(seeds)
      val sec = (System.nanoTime() - t0) / 1e9
      val scheduled = new graft.snapshot.SnapshotStore(store)
        .read(spark, "crawl_log").map(_.count()).getOrElse(0L)
      println(f"[crawlprobe] attempt $a: $scheduled urls in $sec%.2f s = ${scheduled / sec}%.0f urls/s")
    }
    spark.stop()
  }
}
