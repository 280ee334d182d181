package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for expensive per-row stages.
  *
  * The contract tables are single-row-group parquet files, so their scan —
  * and EVERYTHING pipelined into it before the first exchange: explodes,
  * md5 chains, scoring UDFs, partial aggregations — runs as ONE task while
  * the other cores idle (guide §2.6: stragglers and idle capacity; a
  * row-group is parquet's split unit, so `spark.sql.files.*` cannot split
  * it further). `widen` round-robin-repartitions such a frame to the
  * session's parallelism so the heavy projection fans out.
  *
  * Scale posture: the repartition fires ONLY when the input has fewer
  * partitions than cores — a real-scale table (thousands of files /
  * row groups) passes through untouched, so this never inserts a
  * corpus-sized shuffle at 100 TB. Row-to-partition assignment is
  * deterministic under retries (sort-before-repartition, SPARK-23207) and
  * irrelevant to every consumer here (aggregations / joins / per-row
  * projections).
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
