package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-preparation operators for a training-data pipeline: PII
  * redaction, deterministic stratified sampling, and token-budget sequence
  * packing. Everything is engine-portable (regex / md5 / window arithmetic
  * expressible identically in ANSI-ish SQL) so each op is exactly
  * oracle-checkable, and everything is a narrow projection or a bounded
  * shuffle — no driver-side loops.
  */
object Corpus {

  // ---- PII redaction ---------------------------------------------------------

  /** The redaction ladder, applied in order (emails before bare digit runs
    * so an address's host part is not half-rewritten). Patterns restricted
    * to syntax with identical semantics in java.util.regex and RE2
    * (DuckDB) — no backrefs, no lookaround.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val LongNumRe = "\\d{9,}"

  /** Redact PII-shaped spans: emails → [EMAIL], dotted quads → [IP], long
    * digit runs (ids, phone-like) → [NUM]. One codegen'd projection.
    */
  def redactPiiCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      LongNumRe, "[NUM]")

  // ---- stratified sampling ---------------------------------------------------

  /** Portable uniform-[0,1) hash of a key column: first 8 md5 hex chars as
    * an integer over 2^32. Deterministic, seedable via `salt`, identical in
    * any engine with md5 + base conversion (DuckDB:
    * ('0x' || substring(md5(k || '_salt'), 1, 8))::BIGINT / 4294967296.0).
    */
  def uniformHashCol(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit("_" + salt))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Deterministic stratified Bernoulli sample: keep a row iff its key hash
    * falls under its stratum's fraction. Unlike df.sample this is stable
    * across partitioning, retries and engines — the property a training-mix
    * spec needs (re-running the pipeline yields the same corpus).
    * Unlisted strata get `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "sample"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (s, f)) =>
      when(col(strataCol) === s, f).otherwise(acc)
    }
    df.filter(uniformHashCol(col(keyCol), salt) < frac)
  }

  // ---- sequence packing ------------------------------------------------------

  /** Token-budget sequence packing: assign docs (in `idCol` order) to
    * training sequences of capacity `maxTokens`, seq_id = exclusive prefix
    * token count div maxTokens — contiguous greedy binning whose assignment
    * depends only on the data, never the partitioning.
    *
    * Scalable shape (the Sequencer two-pass, applied to a prefix SUM):
    * range-partition by id, per-partition window cumsum, plus per-partition
    * token-total offsets collected to the driver (one tiny row per
    * partition). No global single-partition window anywhere.
    */
  def packSequences(docs: DataFrame, maxTokens: Long, idCol: String,
      tokensCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null token counts bin as 0 tokens (a doc with unknown length must not
    // null-poison its partition's total)
    val toks = coalesce(col(tokensCol).cast("long"), lit(0L))
    // localCheckpoint (eager): the offsets below are computed from THIS
    // materialization, so partition identity must be pinned — a lazy
    // persist could be evicted and recomputed, and any change in the range
    // sampler's view of the input would silently misassign seq_ids. A lost
    // checkpoint block fails the job instead (on a cluster, checkpoint()
    // to reliable storage is the durable variant of the same contract).
    val parted = docs
      .repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parted.groupBy($"__pid")
      .agg(sum(toks).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsetOf = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, t)) => acc + t }.dropRight(1)).toMap
    val offU = udf((pid: Int) => offsetOf(pid))
    // exclusive per-partition prefix sum; the window partitions by __pid so
    // parallelism = partition count, never a global sort
    val w = Window.partitionBy($"__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__prefix",
        offU($"__pid") + coalesce(sum(toks).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__prefix div $maxTokens"))
      .drop("__pid", "__prefix")
  }
}
