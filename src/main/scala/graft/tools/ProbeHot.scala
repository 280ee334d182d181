package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B probes for the remaining hot battery queries (guide §1):
  * q30 agg shapes, q29 parallelism/agg variants, q36 stage split, q50
  * round costs. Throwaway measurement tool.
  */
object ProbeHot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
    docsRaw.count()
    val p = spark.sessionState.conf.numShufflePartitions

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      // ---- q30: old single-level vs new two-level portable sigs ----
      val toksOld = docsRaw.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
      val votesOld = (0 until 60).map(i =>
        sum((shiftrightunsigned(col("h"), i) % 2) * 2 - 1).as(s"v_$i"))
      val sigsOld = toksOld.groupBy(col("doc_id")).agg(votesOld.head, votesOld.tail: _*)
        .select(col("doc_id"),
          (0 until 60).map(i =>
            when(col(s"v_$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _).as("sig"))
      time("q30 sigs OLD one-level")(noop(sigsOld))
      time("q30 sigs NEW two-level")(noop(graft.ops.Dedup.simhashPortableSigs(docsRaw)))
      time("q30 full op")(noop(graft.ops.Dedup.simhashDupPairs(docsRaw, maxHamming = 3,
        bits = 60, maxBucket = Int.MaxValue,
        signatures = graft.ops.Dedup.simhashPortableSigs(_))))

      // ---- q36: signatures vs banding ----
      val sigs36 = graft.ops.Dedup.minhashSignatures(docsRaw, k = 8, shingleW = 3)
      time("q36 signatures only")(noop(sigs36))
      time("q36 full op")(noop(graft.ops.Dedup.lshCandidatePairs(sigs36, k = 8, bands = 4)))

      // ---- q29 variants ----
      val docs29 = docsRaw.filter(graft.ops.TextOps.tokenCountCol(col("text")) >= 2)
      time("q29 current (p)")(noop(graft.ops.Dedup.ngramJaccardPairs(
        docs29, 2, 0.05, maxDf = Int.MaxValue)))
      time("q29 joinParallelism 2p")(noop(graft.ops.Dedup.ngramJaccardPairs(
        docs29, 2, 0.05, maxDf = Int.MaxValue, joinParallelism = 2 * p)))
      time("q29 joinParallelism 4p")(noop(graft.ops.Dedup.ngramJaccardPairs(
        docs29, 2, 0.05, maxDf = Int.MaxValue, joinParallelism = 4 * p)))
      time("q29 joinParallelism 8p")(noop(graft.ops.Dedup.ngramJaccardPairs(
        docs29, 2, 0.05, maxDf = Int.MaxValue, joinParallelism = 8 * p)))
      // agg-in-key variant, 4p
      locally {
        val sets = docs29.select(col("doc_id"),
          array_distinct(graft.ops.Dedup.shingleCol(col("text"), 2)).as("sh"))
          .withColumn("setSize", size(col("sh")))
        val inv = sets.select(col("doc_id"), col("setSize"), explode(col("sh")).as("sh"))
        val parted = inv.repartition(4 * p, col("sh"))
        val a = parted.select(col("sh"), col("doc_id").as("a"), col("setSize").as("sa"))
        val b = parted.select(col("sh"), col("doc_id").as("b"), col("setSize").as("sb"))
        val agg = a.join(b, Seq("sh")).filter(col("a") < col("b") &&
            greatest(col("sa"), col("sb")) * 0.05 <= least(col("sa"), col("sb")))
          .groupBy(col("a"), col("b"), col("sa"), col("sb"))
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
          .filter(col("jaccard") >= 0.05)
          .select("a", "b", "jaccard")
        time("q29 agg-in-key 4p")(noop(agg))
      }
      // shuffled-hash-join hint variant, 4p
      locally {
        val sets = docs29.select(col("doc_id"),
          array_distinct(graft.ops.Dedup.shingleCol(col("text"), 2)).as("sh"))
          .withColumn("setSize", size(col("sh")))
        val inv = sets.select(col("doc_id"), col("setSize"), explode(col("sh")).as("sh"))
        val parted = inv.repartition(4 * p, col("sh"))
        val a = parted.select(col("sh"), col("doc_id").as("a"), col("setSize").as("sa"))
        val b = parted.select(col("sh"), col("doc_id").as("b"), col("setSize").as("sb"))
          .hint("SHUFFLE_HASH")
        val agg = a.join(b, Seq("sh")).filter(col("a") < col("b") &&
            greatest(col("sa"), col("sb")) * 0.05 <= least(col("sa"), col("sb")))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"), min(col("sa")).as("sa"), min(col("sb")).as("sb"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
          .filter(col("jaccard") >= 0.05)
          .select("a", "b", "jaccard")
        time("q29 SHJ 4p")(noop(agg))
      }
    }
    spark.stop()
  }
}
