package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Guide §1.4 isolation bench (SEPARATE from the frozen driver Bench):
  * times each named SparkEntry query with the noop sink (computes every
  * column of every row, discards the result — no sink cost, no count-only
  * column pruning) and can dump `.explain("formatted")` per query for the
  * committed plan evidence (plans/r07/).
  *
  * Usage:
  *   sbt "runMain graft.tools.BenchExtra [q29_... q46_... | all] [--plans DIR] [--reps N]"
  *
  * Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_CPUS (local[N]).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = args.sliding(2).collectFirst { case Array("--plans", d) => d }
    val reps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }.getOrElse(1)
    val names0 = args.filterNot(_.startsWith("--"))
      .filterNot(a => args.sliding(2).exists { case Array(f, v) => f.startsWith("--") && v == a; case _ => false })
    val names =
      if (names0.isEmpty || names0.contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else names0.toSeq

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

    // session warm-up, mirroring Bench (JIT + codegen + parquet footers)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (indexed <- Seq("q33_lsh_topk", "q44_ivf_topk"))
      try graft.SparkEntry.queries(indexed)(spark, sfDir).count()
      catch { case _: Throwable => () }

    val useCount = args.contains("--count")
    def noop(df: DataFrame): Unit =
      if (useCount) { df.count(); () }
      else df.write.format("noop").mode("overwrite").save()

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      plansDir.foreach { dir =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$name.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"benchextra:$name")
        graft.ops.Guard.withQueryTag(name) {
          try noop(fn(spark, sfDir)) catch { case e: Throwable =>
            System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}") }
        }
        spark.sparkContext.setJobDescription(null)
        (System.nanoTime() - t0) / 1e9
      }
      out(name) = times
      println(f"[benchextra] $name: ${times.map(t => f"$t%.3f").mkString(", ")} s")
    }
    val total = out.values.map(_.min).sum
    println(f"[benchextra] total(min-of-reps): $total%.2f s over ${out.size} queries")
    spark.stop()
  }
}
