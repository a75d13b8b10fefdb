package graft.sources

import scala.concurrent.duration._

/** Non-retryable failure (the reference's `permanent` taxonomy:
  * copy-to-current and duplicate-delete failures abort immediately —
  * /root/reference/download/common.go:120,128,134-137).
  */
case class PermanentError(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Retry with exponential backoff
  * (/root/reference/download/common.go:139-160): sleep starts at
  * `initialWait`, doubles each attempt, aborts once the *next* wait would
  * exceed `maxWait` or the error is permanent. With the reference's
  * defaults (1 min → 8 min cap) that is ≤ 6 attempts.
  *
  * The sleeper is injectable so tests enumerate the state machine without
  * real sleeps (the reference tests do the same via fakes,
  * common_test.go:190-256). Spark-wise this wraps *driver-side* source
  * fetches; executor-side transients are covered by task retries
  * (`spark.task.maxFailures`) with `PermanentError` mapped to a fatal.
  */
object Retry {
  val DefaultInitialWait: FiniteDuration = 1.minute
  val DefaultMaxWait: FiniteDuration = 8.minutes

  def withRetry[T](initialWait: FiniteDuration = DefaultInitialWait,
                   maxWait: FiniteDuration = DefaultMaxWait,
                   sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis))
                  (f: => T): Either[Throwable, T] = {
    var wait = initialWait
    while (true) {
      try return Right(f)
      catch {
        case e: PermanentError => return Left(e)
        // NonFatal only: InterruptedException (task cancellation) and
        // fatal VM errors must propagate immediately, not sleep/retry
        case scala.util.control.NonFatal(e) =>
          if (wait > maxWait) return Left(e)
          sleep(wait)
          wait = wait * 2
      }
    }
    sys.error("unreachable")
  }
}
