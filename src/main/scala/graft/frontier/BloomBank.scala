package graft.frontier

import graft.core.UrlCanon
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Partitioned bloom-filter bank over the URL-seen set (north rule: the
  * scale-out realization of the reference's in-memory `seen` dict,
  * /root/reference/crawler/utils/url_deduplicator.py:53-62).
  *
  * The seen set is hash-partitioned by canonical-URL FNV-64 into `p`
  * independent bloom filters so each filter stays small enough for the
  * target FPP at 10^10 keys (e.g. p = 4096 × ~2.4M keys/filter at 1% FPP
  * ≈ 2.9 MB/filter — only the filters for a candidate's partition are
  * consulted, and the bank is broadcast once per round).
  *
  * CORRECTNESS: the bloom is a PRE-FILTER ONLY. `mightContain = false` is
  * authoritative (definitely new); `true` candidates are confirmed against
  * the exact seen table with a left-anti join. False positives therefore
  * cost an extra join probe, never a dropped URL — URL-seen parity is
  * preserved by construction (SURVEY §7.4.3).
  */
final class BloomBank(val partitions: Int, val filters: Array[BloomFilter]) extends Serializable {
  require(filters.length == partitions)

  def mightContain(canonUrl: String): Boolean =
    filters(UrlCanon.partition(canonUrl, partitions)).mightContainString(canonUrl)

  def put(canonUrl: String): Unit =
    filters(UrlCanon.partition(canonUrl, partitions)).putString(canonUrl)

  def merge(other: BloomBank): BloomBank = {
    require(other.partitions == partitions)
    val merged = filters.zip(other.filters).map { case (a, b) =>
      val c = copyOf(a); c.mergeInPlace(b); c
    }
    new BloomBank(partitions, merged)
  }

  private def copyOf(f: BloomFilter): BloomFilter = {
    val bos = new ByteArrayOutputStream(); f.writeTo(bos)
    BloomFilter.readFrom(new ByteArrayInputStream(bos.toByteArray))
  }

  def save(path: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    val out = Files.newOutputStream(tmp)
    try {
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(partitions)
      filters.foreach { f =>
        val bos = new ByteArrayOutputStream(); f.writeTo(bos)
        val bytes = bos.toByteArray
        dos.writeInt(bytes.length); dos.write(bytes)
      }
      dos.flush()
    } finally out.close()
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object BloomBank {

  def empty(partitions: Int, expectedPerPartition: Long, fpp: Double): BloomBank =
    new BloomBank(partitions, Array.fill(partitions)(BloomFilter.create(expectedPerPartition, fpp)))

  def load(path: String): Option[BloomBank] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return None
    val in = new java.io.DataInputStream(Files.newInputStream(p))
    try {
      val n = in.readInt()
      val filters = Array.fill(n) {
        val len = in.readInt(); val bytes = new Array[Byte](len)
        in.readFully(bytes)
        BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      }
      Some(new BloomBank(n, filters))
    } finally in.close()
  }

  /** Distributed build: one bloom per url-hash partition. URLs are first
    * SHUFFLED by their bank-partition id so each task builds only the
    * filters of the pids it owns (without this, every map task would
    * allocate up to `partitions` filters — O(P² · filterBytes) transient
    * memory across the stage). Collected bytes = exactly P filters.
    */
  def build(df: DataFrame, canonCol: String, partitions: Int,
            expectedPerPartition: Long, fpp: Double): BloomBank = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p = partitions; val exp = expectedPerPartition; val f = fpp
    val perPart: Array[(Int, Array[Byte])] = df.select(canonCol).as[String]
      .map(u => (UrlCanon.partition(u, p), u))
      .repartition(p, col("_1"))
      .mapPartitions { it =>
        val local = scala.collection.mutable.Map.empty[Int, BloomFilter]
        it.foreach { case (pid, url) =>
          local.getOrElseUpdate(pid, BloomFilter.create(exp, f)).putString(url)
        }
        local.iterator.map { case (pid, bf) =>
          val bos = new ByteArrayOutputStream(); bf.writeTo(bos); (pid, bos.toByteArray)
        }
      }.collect()

    val bank = empty(p, exp, f)
    perPart.foreach { case (pid, bytes) =>
      bank.filters(pid).mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(bytes)))
    }
    bank
  }
}
