package graft.sources

import scala.annotation.tailrec
import scala.util.control.NonFatal

/** Connector-side fault tolerance — the engine half of the reference's
  * live-API retry semantics. Spark already retries *tasks*; what it cannot
  * know is which **connector** failures are transient (a CDN 525 handshake
  * error), which invalidate cached connector state (a stale session file
  * that must be deleted before the next attempt), and which should degrade
  * gracefully instead of failing the whole run (an optional feed erroring).
  * Those three behaviors, from the reference:
  *
  *  - 3-attempt retry on CloudFlare transport error 525 with a fixed 5 s
  *    sleep and stale-session delete before each retry (v3:1057-1082)
  *  - 401 unauthorized ⇒ delete the session and re-login once (v3:1339-1351)
  *  - optional-feed failure degrades gracefully without failing the run
  *    (budgets, v3:1178-1213)
  *
  * are generalized here as pure driver-side control flow around a by-name
  * op (typically "read a response file / call the API and return a
  * DataFrame"). Nothing Spark-distributed happens inside: retrying a *job*
  * belongs to Spark's scheduler, retrying the *connector call that builds
  * the frame* belongs here.
  */
object Retry {

  /** Retry policy: which errors are transient, how many attempts, how long
    * to wait before attempt k (1-based retry index), and what cached state
    * to invalidate before retrying.
    *
    * The default matches the reference: 3 attempts, fixed 5 s delay,
    * retry-on-525. `backoffMs(k)` makes exponential policies expressible
    * (`k => base << (k-1)`) without changing the call shape; `sleeper` is
    * injectable so specs assert the schedule instead of sleeping it.
    */
  final case class Policy(
      maxAttempts: Int = 3,
      isRetryable: Throwable => Boolean = transportError525,
      backoffMs: Int => Long = _ => 5000L,
      invalidate: () => Unit = () => (),
      sleeper: Long => Unit = Thread.sleep)

  /** The reference's retryable classification: CloudFlare SSL-handshake
    * transport errors surface as "525" in the message (v3:1072). */
  val transportError525: Throwable => Boolean =
    e => Option(e.getMessage).exists(_.contains("525"))

  /** HTTP 401 / unauthorized classification (v3:1339-1351's re-login
    * trigger). */
  val unauthorized: Throwable => Boolean =
    e => Option(e.getMessage).exists(m => m.contains("401") ||
      m.toLowerCase.contains("unauthorized"))

  /** Run `op`, retrying retryable failures per `policy`. Non-retryable
    * failures and the final exhausted attempt re-raise unchanged (the
    * reference prints-and-raises after max_retries). Before each retry the
    * policy's `invalidate` hook runs — the reference unlinks the stale
    * session pickle there — then the backoff sleep for that retry index. */
  def withRetries[T](policy: Policy = Policy())(op: => T): T = {
    require(policy.maxAttempts >= 1, "maxAttempts must be >= 1")
    @tailrec def attempt(k: Int): T = {
      val r =
        try Right(op)
        catch {
          case NonFatal(e) if k < policy.maxAttempts && policy.isRetryable(e) =>
            Left(e)
        }
      r match {
        case Right(v) => v
        case Left(_) =>
          policy.invalidate()
          policy.sleeper(policy.backoffMs(k))
          attempt(k + 1)
      }
    }
    attempt(1)
  }

  /** The 401 shape: one re-authentication retry. `reauth` replaces the
    * reference's delete-session + interactive re-login; any second failure
    * (or a non-auth failure) propagates. */
  def withReauth[T](reauth: () => Unit,
                    isAuthError: Throwable => Boolean = unauthorized)(op: => T): T =
    try op
    catch {
      case NonFatal(e) if isAuthError(e) =>
        reauth()
        op
    }

  /** Optional-feed graceful degradation (v3:1178-1213): a failure yields
    * `fallback` (the reference logs and continues with no budget rows)
    * instead of failing the run. The error is reported through `onError`
    * so degradation is never silent. */
  def gracefulDegrade[T](fallback: => T,
                         onError: Throwable => Unit =
                           e => System.err.println(s"[retry] degraded: $e"))
                        (op: => T): T =
    try op
    catch {
      case NonFatal(e) =>
        onError(e)
        fallback
    }
}
