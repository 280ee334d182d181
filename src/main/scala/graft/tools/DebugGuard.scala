package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the default-on guard telemetry path (not part
  * of the engine; run by hand via tools/run_bench.sh).
  */
object DebugGuard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        println(s"[debug-listener] onSuccess func=$funcName observed=${qe.observedMetrics}")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
        println(s"[debug-listener] onFailure $funcName $exception")
    })

    val docs = spark.range(40).select($"id".cast("string").as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon doc "), $"id".cast("string")).as("text"))
    val n = graft.ops.Dedup.ngramJaccardPairs(docs, shingleW = 2, threshold = 0.2, maxDf = 1).count()
    println(s"[debug] pairs=$n")
    Thread.sleep(5000)
    println(s"[debug] ledger=${graft.ops.Guard.drainDropLedger()}")
    spark.stop()
  }
}
