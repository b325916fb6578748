package graft

/** Bounded retry for the engine's fail-fast contention posture. Every
  * writer-side collision in the engine THROWS
  * `ConcurrentModificationException` instead of blocking or silently
  * losing an update (the writer lock, the shared append gate, the
  * change feed's seal, IncrementalAgg's pointer commit) — the
  * documented recovery is "retry after the holder finishes". This is
  * that loop, once: capped exponential backoff with full jitter
  * (decorrelated waiters — N colliding writers that all back off the
  * same fixed amount re-collide in lockstep), retrying ONLY the
  * contention signal. Everything else (refusals, IO errors, bad input)
  * propagates on first throw: those are answers, not races.
  *
  * {{{
  *   Retry.onContention() { lake.ingest(batch) }
  *   Retry.onContention(maxAttempts = 50) { lake.seal() }
  * }}}
  *
  * Driver-side only (it sleeps the calling thread between attempts);
  * at most `maxAttempts` tries, then the last
  * ConcurrentModificationException propagates — a lock held past the
  * whole backoff budget usually means a crashed writer, which is
  * `repair()`/`vacuum(force)` territory, not more retries. */
object Retry {

  /** Run `body`, retrying on `ConcurrentModificationException` with
    * capped-exponential full-jitter backoff: attempt i sleeps a uniform
    * random duration in [0, min(maxDelayMs, baseDelayMs·2^i)]. */
  def onContention[T](maxAttempts: Int = 20, baseDelayMs: Long = 50L,
      maxDelayMs: Long = 2000L)(body: => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          val cap = math.min(maxDelayMs,
            baseDelayMs * (1L << math.min(attempt, 20)))
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(cap + 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
