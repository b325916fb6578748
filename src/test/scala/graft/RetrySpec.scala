package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-retry loop: retries ONLY the engine's fail-fast
  * contention signal, propagates everything else first-throw, gives up
  * after maxAttempts with the last contention error. */
class RetrySpec extends AnyFunSuite {

  test("retries contention until the body succeeds") {
    var calls = 0
    val out = Retry.onContention(maxAttempts = 10, baseDelayMs = 1,
      maxDelayMs = 2) {
      calls += 1
      if (calls < 4) throw new java.util.ConcurrentModificationException("held")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 4)
  }

  test("non-contention failures propagate on the FIRST throw — refusals are answers, not races") {
    var calls = 0
    val e = intercept[IllegalArgumentException](
      Retry.onContention(maxAttempts = 10, baseDelayMs = 1, maxDelayMs = 2) {
        calls += 1
        throw new IllegalArgumentException("bad dim")
      })
    assert(e.getMessage === "bad dim")
    assert(calls === 1, "a refusal must never be retried")
  }

  test("gives up after maxAttempts with the last contention error") {
    var calls = 0
    intercept[java.util.ConcurrentModificationException](
      Retry.onContention(maxAttempts = 3, baseDelayMs = 1, maxDelayMs = 2) {
        calls += 1
        throw new java.util.ConcurrentModificationException(s"attempt $calls")
      })
    assert(calls === 3)
    intercept[IllegalArgumentException](
      Retry.onContention(maxAttempts = 0)("never runs"))
  }
}
