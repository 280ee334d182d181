package graft.frontier

import graft.core.UrlCanon
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType, StructField, StructType}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Partitioned bloom-filter bank over the URL-seen set (north rule: the
  * scale-out realization of the reference's in-memory `seen` dict,
  * /root/reference/crawler/utils/url_deduplicator.py:53-62).
  *
  * The seen set is hash-partitioned by canonical-URL FNV-64 into `width`
  * independent bloom filters so each filter stays small enough for the
  * target FPP at 10^10 keys (e.g. width = 4096 × ~2.4M keys/filter at 1%
  * FPP ≈ 2.9 MB/filter).
  *
  * DISTRIBUTED LAYOUT (round-2 redesign; round 1 collected the bank to the
  * driver and broadcast it whole — O(bank) on the driver and O(bank ×
  * executors) on the network, both scale-killers at the 10^10-key target):
  * the bank lives as an `RDD[(pid, filterBytes)]` under a
  * `HashPartitioner(width)`, so pid i's blob sits in partition i and NEVER
  * moves:
  *   - probe: candidates are keyed by pid and `partitionBy`-shuffled to the
  *     bank's partitioner, then `zipPartitions` probes each candidate
  *     against its partition's blob — only the (small) candidate side
  *     crosses the network, the bank side is narrow;
  *   - merge: per-round banks share the partitioner, so OR-ing blobs is a
  *     `zipPartitions` too — zero shuffle, O(bank) CPU spread across the
  *     cluster;
  *   - persistence: one parquet table of (pid, filter, width) rows per
  *     round — written/read with ordinary distributed I/O, nothing
  *     driver-resident. The width column makes the saved bank
  *     SELF-DESCRIBING: a resume under a different `seenPartitions` config
  *     keeps probing at the width the filters were BUILT with (pid =
  *     hash(url) mod built-width). Re-partitioning bloom filters is
  *     impossible, and probing saved filters at a different modulus would
  *     turn bloom "false" — which the dedup tier treats as authoritative
  *     definitely-new — into silent re-crawls.
  *
  * CORRECTNESS: the bloom is a PRE-FILTER ONLY. `mightContain = false` is
  * authoritative (definitely new); `true` candidates are confirmed against
  * the exact seen table with a left-anti join. False positives therefore
  * cost an extra join probe, never a dropped URL — URL-seen parity is
  * preserved by construction (SURVEY §7.4.3).
  */
object DistBloomBank {

  /** A bank: its build GEOMETRY (width + per-filter expected insertions +
    * fpp — `mergeInPlace` requires identical numBits/numHashFunctions, so
    * ALL of it must survive a resume, not just the width) plus
    * (pid, serialized filter) rows, always partitioned by
    * HashPartitioner(width) with pid i in partition i (Int hashCode is
    * identity). All probes derive pid from `width`, never from the current
    * session config.
    */
  final case class Bank(width: Int, expected: Long, fpp: Double,
      rdd: RDD[(Int, Array[Byte])]) {
    /** MEMORY_AND_DISK: an evicted MEMORY_ONLY bank partition would
      * recompute through every prior round's merge lineage (or, post
      * rebuild, one seen-chain scan) — blobs are small, disk is cheap.
      */
    def persist(): Bank = { rdd.persist(StorageLevel.MEMORY_AND_DISK); this }
    def unpersist(): Bank = { rdd.unpersist(); this }
    def count(): Long = rdd.count()
  }

  private def ser(f: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); f.writeTo(bos); bos.toByteArray
  }
  private def deser(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  /** Build one round's bank from a (canon) DataFrame: shuffle urls to their
    * pid's partition, build exactly one filter per non-empty pid there.
    * Pids with no urls this round emit nothing (probe treats a missing
    * blob as mightContain = false, which is exact: nothing was inserted).
    */
  def buildRound(df: DataFrame, canonCol: String, partitions: Int,
      expectedPerPartition: Long, fpp: Double): Bank = {
    val p = partitions; val exp = expectedPerPartition; val f = fpp
    Bank(p, exp, f, df.select(canonCol).rdd
      .map(r => (UrlCanon.partition(r.getString(0), p), r.getString(0)))
      .partitionBy(new HashPartitioner(p))
      .mapPartitions({ it =>
        if (it.isEmpty) Iterator.empty
        else {
          val bf = BloomFilter.create(exp, f)
          var pid = -1
          it.foreach { case (k, u) => pid = k; bf.putString(u) }
          Iterator((pid, ser(bf)))
        }
      }, preservesPartitioning = true))
  }

  /** OR-merge two co-partitioned banks — narrow (no shuffle). */
  def merge(a: Bank, b: Bank): Bank = {
    require(a.width == b.width && a.expected == b.expected && a.fpp == b.fpp,
      s"bank geometry mismatch: (${a.width},${a.expected},${a.fpp}) vs " +
        s"(${b.width},${b.expected},${b.fpp}) — mergeInPlace needs identical filter geometry")
    Bank(a.width, a.expected, a.fpp,
      a.rdd.zipPartitions(b.rdd, preservesPartitioning = true) { (ia, ib) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Int, BloomFilter]
      (ia ++ ib).foreach { case (pid, bytes) =>
        m.get(pid) match {
          case Some(g) => g.mergeInPlace(deser(bytes))
          case None    => m(pid) = deser(bytes)
        }
      }
      m.iterator.map { case (pid, bf) => (pid, ser(bf)) }
    })
  }

  /** Adds boolean column `flag` = bank.mightContain(canon). Only the
    * candidate rows shuffle (to the bank's partitioner — pid computed at
    * the BANK's width, regardless of session config); each task probes its
    * partition's blob in place.
    */
  def probe(cands: DataFrame, canonCol: String, bank: Bank, flag: String): DataFrame = {
    val spark = cands.sparkSession
    val schema = cands.schema
    val idx = schema.fieldIndex(canonCol)
    val p = bank.width
    val keyed = cands.rdd
      .map(r => (UrlCanon.partition(r.getString(idx), p), r))
      .partitionBy(new HashPartitioner(p))
    val probed = keyed.zipPartitions(bank.rdd, preservesPartitioning = false) { (cit, bit) =>
      val filters = bit.map(kv => deser(kv._2)).toArray
      cit.map { case (_, r) =>
        val maybe = filters.nonEmpty &&
          filters.exists(_.mightContainString(r.getString(idx)))
        Row.fromSeq(r.toSeq :+ maybe)
      }
    }
    spark.createDataFrame(probed,
      StructType(schema.fields :+ StructField(flag, BooleanType, nullable = false)))
  }

  private val saveSchema = StructType(Seq(
    StructField("pid", IntegerType, nullable = false),
    StructField("filter", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("expected", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("fpp", org.apache.spark.sql.types.DoubleType, nullable = false)))

  /** Persist as a parquet table of (pid, filter, width, expected, fpp) —
    * distributed write; the geometry columns make the table
    * self-describing for load().
    */
  def save(spark: SparkSession, bank: Bank, path: String): Unit =
    spark.createDataFrame(
      bank.rdd.map { case (pid, b) => Row(pid, b, bank.width, bank.expected, bank.fpp) },
      saveSchema)
      .write.mode("overwrite").parquet(path)

  /** Load a saved bank at ITS OWN recorded geometry (never the current
    * config's: filters cannot be re-hashed or re-sized, and probing them
    * at a different modulus silently re-crawls seen URLs, while merging
    * with differently-sized round filters throws in mergeInPlace). A
    * resume that changed the config simply keeps the old geometry until
    * the bank is next rebuilt from the seen chain. A bank saved without
    * geometry columns (foreign/older format) returns None — the caller's
    * exact-anti-join fallback carries correctness.
    */
  def load(spark: SparkSession, path: String): Option[Bank] = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return None
    val df = spark.read.parquet(path)
    val cols = df.schema.fieldNames.toSet
    if (!Set("pid", "filter", "width", "expected", "fpp").subsetOf(cols)) {
      System.err.println(s"[bloom] bank at $path lacks geometry columns — " +
        "falling back to exact-only dedup for this resume")
      return None
    }
    val geom = df.select("width", "expected", "fpp").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    if (geom.isEmpty) return None // empty bank: nothing was ever inserted
    require(geom.length == 1, s"corrupt bank at $path: mixed geometry ${geom.mkString(",")}")
    val (w, exp, f) = geom(0)
    Some(Bank(w, exp, f, df.select("pid", "filter").rdd
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
      .partitionBy(new HashPartitioner(w))))
  }

  /** Driver-side view for tests/diagnostics ONLY (collects the bank). */
  def toLocal(bank: Bank): BloomBank = {
    val filters = new Array[BloomFilter](bank.width)
    bank.rdd.collect().foreach { case (pid, b) => filters(pid) = deser(b) }
    new BloomBank(bank.width, filters)
  }
}

/** Driver-local bank view — used by tests and the sequential oracle's
  * cross-checks; the engine itself only ever touches DistBloomBank.
  * A null slot means "no urls ever hashed to this pid" (mightContain
  * = false, exactly).
  */
final class BloomBank(val partitions: Int, val filters: Array[BloomFilter]) extends Serializable {
  require(filters.length == partitions)

  def mightContain(canonUrl: String): Boolean = {
    val f = filters(UrlCanon.partition(canonUrl, partitions))
    f != null && f.mightContainString(canonUrl)
  }
}
