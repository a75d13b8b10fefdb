package graft.plans

import scala.concurrent.duration._
import scala.util.Random

/** The eternal driver loop (operators O1–O2 of SURVEY §2.1): run every
  * source each iteration, set the all-success gauge only when every
  * source succeeded (/root/reference/downloader.go:59-103, 98-100),
  * sleep a uniformly-jittered interval. Clock/sleep/rng injectable so
  * the loop is testable without wall time; unlike the reference, a
  * setup failure still sleeps (the reference busy-loops,
  * downloader.go:65-68 — noted as a bug in SURVEY O1).
  */
object Scheduler {

  /** Uniform jitter in [interval − deviation/2, interval + deviation/2]
    * (reference `GenUniformSleepTime`, download/common.go:43-49). */
  def uniformJitter(interval: FiniteDuration, deviation: FiniteDuration,
                    rng: Random): FiniteDuration = {
    val base = interval - deviation / 2
    base + (deviation.toNanos * rng.nextDouble()).toLong.nanos
  }

  /** Run `sources` each iteration until `iterations` runs complete (use
    * Int.MaxValue for the eternal form). Returns per-iteration
    * all-success flags. */
  def loop(sources: Seq[() => Boolean],
           iterations: Int,
           onAllSuccess: () => Unit = () => (),
           onIteration: (Int, Boolean) => Unit = (_, _) => (),
           interval: FiniteDuration = 24.hours,
           deviation: FiniteDuration = 4.hours,
           sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis),
           rng: Random = new Random()): Seq[Boolean] =
    (0 until iterations).map { i =>
      val results = sources.map(s =>
        try s() catch { case scala.util.control.NonFatal(_) => false })
      val all = results.forall(identity)
      if (all) onAllSuccess()
      // per-iteration flush point (metrics publication etc.) before sleep
      onIteration(i, all)
      if (i < iterations - 1) // no pointless sleep after the last run
        sleep(uniformJitter(interval, deviation, rng))
      all
    }
}
