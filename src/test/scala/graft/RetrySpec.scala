package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry
import graft.sources.Retry.Policy

/** Pins the reference's connector fault-tolerance semantics (SURVEY §2
  * retry row): 3×-525 retry with stale-state invalidation and fixed delay,
  * one-shot 401 re-auth, optional-feed graceful degradation. Pure driver
  * control flow — no SparkSession needed. */
class RetrySpec extends AnyFunSuite {

  private def flaky(failures: Int, msg: String): () => String = {
    var n = 0
    () => { if (n < failures) { n += 1; throw new RuntimeException(msg) }; s"ok after $n" }
  }

  test("retries 525 failures with invalidation and the reference schedule") {
    val slept = collection.mutable.Buffer[Long]()
    var invalidated = 0
    val op = flaky(2, "Transport error 525: handshake failed")
    val got = Retry.withRetries(Policy(
      invalidate = () => invalidated += 1,
      sleeper = slept += _))(op())
    assert(got == "ok after 2")
    assert(invalidated == 2)       // stale session deleted before EACH retry
    assert(slept.toSeq == Seq(5000L, 5000L)) // fixed 5s, reference schedule
  }

  test("exhausted attempts re-raise the last error unchanged") {
    val op = flaky(3, "error 525 again")
    val ex = intercept[RuntimeException] {
      Retry.withRetries(Policy(sleeper = _ => ()))(op())
    }
    assert(ex.getMessage.contains("525"))
  }

  test("non-retryable errors propagate immediately, no sleep, no invalidate") {
    val slept = collection.mutable.Buffer[Long]()
    var invalidated = 0
    val ex = intercept[RuntimeException] {
      Retry.withRetries(Policy(invalidate = () => invalidated += 1,
        sleeper = slept += _))(throw new RuntimeException("500 internal"))
    }
    assert(ex.getMessage == "500 internal")
    assert(slept.isEmpty && invalidated == 0)
  }

  test("exponential policy is expressible via backoffMs(k)") {
    val slept = collection.mutable.Buffer[Long]()
    val op = flaky(3, "525")
    Retry.withRetries(Policy(maxAttempts = 4,
      backoffMs = k => 100L << (k - 1), sleeper = slept += _))(op())
    assert(slept.toSeq == Seq(100L, 200L, 400L))
  }

  test("401 triggers exactly one re-auth; second failure propagates") {
    var reauths = 0
    val op = flaky(1, "401 Unauthorized")
    assert(Retry.withReauth(() => reauths += 1)(op()) == "ok after 1")
    assert(reauths == 1)
    // always-failing auth: re-auth once, then the retry's failure escapes
    reauths = 0
    intercept[RuntimeException] {
      Retry.withReauth(() => reauths += 1)(
        throw new RuntimeException("401 Unauthorized"))
    }
    assert(reauths == 1)
    // non-auth error: no re-auth at all
    reauths = 0
    intercept[RuntimeException] {
      Retry.withReauth(() => reauths += 1)(throw new RuntimeException("525"))
    }
    assert(reauths == 0)
  }

  test("graceful degradation returns the fallback and reports the error") {
    var reported: Option[String] = None
    val got = Retry.gracefulDegrade(fallback = Seq.empty[Int],
      onError = e => reported = Some(e.getMessage)) {
      throw new RuntimeException("budgets feed exploded"); Seq(1)
    }
    assert(got == Seq.empty)
    assert(reported.exists(_.contains("budgets")))
    // the happy path never consults the fallback
    assert(Retry.gracefulDegrade(Seq.empty[Int])(Seq(1, 2)) == Seq(1, 2))
  }
}
