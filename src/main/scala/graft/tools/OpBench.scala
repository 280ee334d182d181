package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query (count() as the action), N reps.
  * Usage: runMain graft.tools.OpBench <queryName> [sfDir] [reps] [cores]
  * Prints per-rep seconds and the executed plan on the last rep with
  * GRAFT_EXPLAIN=1.
  */
object OpBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cores = args.lift(3).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (0 until reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"[opbench] $name rep=$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      if (r == reps - 1 && sys.env.get("GRAFT_EXPLAIN").contains("1"))
        df.explain("formatted")
    }
    spark.stop()
  }
}
