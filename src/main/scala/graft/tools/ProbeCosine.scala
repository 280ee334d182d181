package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B: interpreted HOF cosine vs tight-loop UDF cosine on the
  * q34 bucketed-neighbors shape. Throwaway measurement tool. */
object ProbeCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(l: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"[probe] $l: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def hofCosine(a: Column, b: Column): Column = {
      def dot(x: Column, y: Column) =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0d), (acc, v) => acc + v)
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    import org.apache.spark.sql.expressions.Window
    def q34shape(cos: (Column, Column) => Column): DataFrame = {
      val p = spark.sessionState.conf.numShufflePartitions
      val bucketed = graft.ops.Par.widen(emb).withColumn("bucket",
          graft.ops.Similarity.signBucketCol(col("embedding"), 64, 8, 42L))
        .repartition(p, col("bucket"))
      val small = bucketed.groupBy(col("bucket")).count()
        .filter(col("count") <= 10000).select("bucket")
      val guarded = bucketed.join(small, Seq("bucket"))
      val a = guarded.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("va"))
      val b = guarded.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("vb"))
      val pairs = a.join(b, Seq("bucket")).filter(col("a") =!= col("b"))
        .withColumn("cosine", round(cos(col("va"), col("vb")), 6))
      val w = Window.partitionBy(col("a")).orderBy(col("cosine").desc, col("b"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("a", "b", "cosine")
    }
    (1 to 3).foreach { r =>
      time(s"q34 HOF rep$r")(noop(q34shape(hofCosine)))
      time(s"q34 UDF rep$r")(noop(q34shape(graft.ops.Dedup.cosineCol)))
    }
    spark.stop()
  }
}
