package graft.tools

import scala.collection.mutable.ArrayBuffer

/** In-run host-noise sampler.
  *
  * The bench's bracketing spin probes (`ScalingBench.cpuSpeedPerThread`
  * before/after the timed work) only see a run's ENDPOINTS: an external
  * host burst that starts and ends inside the run leaves both probes
  * clean and the record silently contaminated (the round-4 7,074 urls/s
  * crawl and the 5.97k outlier were exactly this — inferred from battery
  * spread, not measured). This daemon thread samples a short
  * single-thread register-spin probe every `periodMs` DURING the run and
  * reports min / median, making a burst-straddled record self-flagging.
  *
  * Why a 1-thread probe is a valid signal mid-run: the bench levels
  * (local[6] / local[24] / local[32] of 32 vCPUs) leave spare vCPUs, and
  * even at full subscription the probe thread gets scheduled within its
  * 200 ms window; what depresses it is the HOST (microVM co-tenants)
  * stealing cycles — the same mechanism the bracketing probes measure,
  * now sampled through the middle. On a clean host the samples sit in
  * the same ~700-800 M/s band as the bracketing pair; a burst window
  * shows as min ≪ median (burst shorter than the run) or a depressed
  * median (burst covering it).
  */
final class NoiseSampler(periodMs: Long = 5000, probeMs: Long = 200) {
  private val samples = ArrayBuffer.empty[Double]
  @volatile private var running = true
  private val t = new Thread(() => {
    // discard one probe so the spin loop is JITted before the first
    // recorded sample (same rule as the bracketing probes)
    ScalingBench.cpuSpeedPerThread(1, probeMs)
    while (running) {
      val s = ScalingBench.cpuSpeedPerThread(1, probeMs)
      samples.synchronized { samples += s }
      val deadline = System.nanoTime() + periodMs * 1000000L
      while (running && System.nanoTime() < deadline) Thread.sleep(50)
    }
  })
  t.setDaemon(true)
  t.setName("graft-noise-sampler")
  t.start()

  /** Stop sampling and summarize. */
  def stop(): NoiseSampler.Report = {
    running = false
    t.join(2000)
    val xs = samples.synchronized { samples.toVector }.sorted
    if (xs.isEmpty) NoiseSampler.Report(0, Double.NaN, Double.NaN, Double.NaN)
    else NoiseSampler.Report(xs.size, xs.head, xs(xs.size / 4), xs(xs.size / 2))
  }
}

object NoiseSampler {
  /** Clean-host floor for the idle reference (iterations/sec). The
    * register-spin probe on this box reads ~700-800 M/s whenever the host
    * is actually idle (measured across four rounds of bracketing probes);
    * a bracketing probe BELOW this band means the "idle" measurement
    * itself ate a burst — flagging against it would let a fully-noisy
    * window self-approve (observed: a crawl with in-run median 514 M/s
    * passed because its bracketing probes read 204/339). Callers floor
    * their idleRef at this constant so the flag criteria never reference
    * a depressed baseline.
    */
  val CleanHostFloor: Double = 700e6

  /** min/p25/median in iterations/sec (divide by 1e6 for the M/s the
    * bracketing probes print).
    *
    * Burst detection is IDLE-REFERENCED, not self-relative: on a clean
    * host CFS fairness gives the probe thread nearly a full vCPU even at
    * full subscription (measured at local[32]: in-run median 722 M/s vs
    * 748 idle — 33 runnable threads on 32 vCPUs each get ~32/33 of a
    * core), so the in-run median sits in a narrow band below the
    * bracketing idle probes and an EXTERNAL burst (extra runnable
    * threads from a co-tenant) pushes it below that band. A self-relative
    * criterion (p25 vs own median) false-positives on our own job's
    * transient squeezes — GC pauses, stage-boundary scheduling bursts —
    * which crater min/p25 on a perfectly clean host.
    *
    * `flaggedVsIdle(idleRef)`: median fell >`medianFrac` below the
    * bracketing single-thread idle probe (a burst covering most of the
    * run — the observed co-tenant bursts run ~10 min), or p25 fell below
    * `p25Frac` of idle (a burst covering ≥¼ of it). Callers pick margins
    * for their subscription level: runs with spare vCPUs (ScalingBench's
    * local[6]/local[24] on 32) can use tight margins; a fully-subscribed
    * local[32] run needs looser ones for the self-squeeze on p25.
    */
  final case class Report(n: Int, min: Double, p25: Double, median: Double) {
    def minMps: Double = min / 1e6
    def medianMps: Double = median / 1e6
    def flaggedVsIdle(idleRef: Double, medianFrac: Double = 0.85,
        p25Frac: Double = 0.70): Boolean =
      n >= 4 && idleRef > 0 &&
        (median < medianFrac * idleRef || p25 < p25Frac * idleRef)
    def json(flagged: Boolean): String =
      if (n == 0) """{"n":0}"""
      else f"""{"n":$n,"min_mps":$minMps%.1f,"p25_mps":${p25 / 1e6}%.1f,""" +
        f""""median_mps":$medianMps%.1f,"flagged":$flagged}"""
  }
}
