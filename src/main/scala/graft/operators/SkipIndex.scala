package graft.operators

/** Helpers for the per-shard id Bloom skip index (`<root>/_skip`) —
  * the data-skipping sidecar that lets id-probing ops ([[graft.Lake.lookup]],
  * [[graft.Lake.deleteIds]], upsert's old-version probe) touch only the
  * shards that might hold a given id, instead of reading the id column
  * of every live file. The file-level analog of a log-structured table
  * format's per-file stats: at 100 TB the difference between a
  * point-read costing one shard and costing the whole lake.
  *
  * Freshness is structural, not transactional: each indexed shard
  * records a fingerprint of the exact live file set it was built from
  * ([[fingerprint]]). A probe recomputes the fingerprint from the
  * current listing and uses the sketch ONLY on a match — any append,
  * rewrite, or compact to a shard changes its file set, so a stale
  * sketch can never skip a shard that gained rows. Staleness, absence,
  * or corruption all degrade to the exact full probe, never to a wrong
  * answer.
  *
  * The reference has no point-read path at all (its id handling is an
  * in-memory pandas column, /root/reference/vector_lake/core/frame.py);
  * this is north-star scale infrastructure.
  */
object SkipIndex {

  /** Stable fingerprint of a shard's live file set, as (path, length)
    * pairs. Order-independent (sorted before hashing); any file added,
    * removed, or resized changes it. Paths are generation-qualified, so
    * a rewrite that re-creates byte-identical files in a new generation
    * still invalidates. */
  def fingerprint(files: Seq[(String, Long)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.sortBy(_._1).foreach { case (p, len) =>
      md.update(s"$p:$len\n".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Bloom bits for `n` items at target false-positive rate `fpp`
    * (the standard -n·ln(p)/ln²2 sizing; ~9.6 bits/item at 1%). */
  def optimalBits(n: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    math.max(64L, math.ceil(
      -n.toDouble * math.log(fpp) / (math.log(2.0) * math.log(2.0))).toLong)
  }
}
