package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage isolation for the n-gram Jaccard family (guide §1.4):
  * times each sub-plan of ngramJaccardPairs with the noop sink to find
  * where q29/q46 actually spend their seconds. Throwaway measurement tool.
  */
object ProbeNgram {
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
    docsRaw.count() // warm footer
    val docs = docsRaw.filter(graft.ops.TextOps.tokenCountCol(col("text")) >= 2)
    val shingleW = 2; val threshold = 0.05
    val p = spark.sessionState.conf.numShufflePartitions

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val sets = docs.select(col("doc_id"),
        array_distinct(graft.ops.Dedup.shingleCol(col("text"), shingleW)).as("sh"))
        .withColumn("setSize", size(col("sh")))
      time("sets")(noop(sets))
      val inv = sets.select(col("doc_id"), col("setSize"), explode(col("sh")).as("sh"))
      time("inv")(noop(inv))
      val counts = inv.groupBy("sh").count()
      time("counts")(noop(counts))
      val kept = counts.filter(col("count") <= 35).select("sh")
      val filtered = inv.join(kept, Seq("sh"))
      time("filtered(q46)")(noop(filtered))
      val parted46 = filtered.repartition(p, col("sh"))
      time("parted(q46)")(noop(parted46))
      val a46 = parted46.select(col("sh"), col("doc_id").as("a"), col("setSize").as("sa"))
      val b46 = parted46.select(col("sh"), col("doc_id").as("b"), col("setSize").as("sb"))
      val joined46 = a46.join(b46, Seq("sh")).filter(col("a") < col("b") &&
        greatest(col("sa"), col("sb")) * threshold <= least(col("sa"), col("sb")))
      time("selfjoin(q46)")(noop(joined46))
      val agg46 = joined46.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("inter"), min(col("sa")).as("sa"), min(col("sb")).as("sb"))
      time("agg(q46)")(noop(agg46))
      time("q46 full op")(noop(graft.ops.Dedup.ngramJaccardPairs(
        docs, shingleW, threshold, maxDf = 35)))
      // capless q29 path
      val parted29 = inv.repartition(p, col("sh"))
      val a29 = parted29.select(col("sh"), col("doc_id").as("a"), col("setSize").as("sa"))
      val b29 = parted29.select(col("sh"), col("doc_id").as("b"), col("setSize").as("sb"))
      val joined29 = a29.join(b29, Seq("sh")).filter(col("a") < col("b") &&
        greatest(col("sa"), col("sb")) * threshold <= least(col("sa"), col("sb")))
      time("selfjoin(q29)")(noop(joined29))
      val agg29 = joined29.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("inter"), min(col("sa")).as("sa"), min(col("sb")).as("sb"))
      time("agg(q29)")(noop(agg29))
      time("q29 full op")(noop(graft.ops.Dedup.ngramJaccardPairs(
        docs, shingleW, threshold, maxDf = Int.MaxValue)))
    }
    spark.stop()
  }
}
