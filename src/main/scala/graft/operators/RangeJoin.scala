package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval × point range join as a bucketed EQUI-join.
  *
  * The naive formulation `points JOIN intervals ON pt BETWEEN lo AND hi`
  * has no equality predicate, so Spark plans a broadcast nested-loop (or
  * worse, a cartesian) — O(|points| × |intervals|) comparisons, the
  * classic 100 TB stage-killer. This operator restores an equi-key by
  * quantizing time into fixed-width bins:
  *
  *   1. each interval explodes into the bins it covers
  *      (`sequence(floor(lo/w), floor(hi/w))` — bounded by the interval
  *      length / bin width);
  *   2. each point maps to exactly ONE bin (`floor(pt/w)`);
  *   3. equi-join on the bin, then the exact `lo <= pt <= hi` residual.
  *
  * Because a point owns a single bin, a (point, interval) pair can meet
  * in at most one bin — no post-join dedup is needed, which keeps the
  * whole thing one shuffle (or zero with `broadcastIntervals`, the right
  * call whenever the interval table is dimension-sized).
  *
  * Pick `binSeconds` ≈ the typical interval length: shorter bins mean
  * more exploded rows per interval, longer bins mean more residual
  * filtering per bin. Skewed bins (a hot hour) can further be salted
  * with [[Skew]].
  *
  * The reference engine has no join at all (its tables are independent
  * pandas frames, /root/reference/vector_lake/core/frame.py) — this is
  * part of the §2.10 relational completion.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing
    * `pointTs` (inclusive bounds). `loTs`/`hiTs`/`pointTs` are timestamp
    * columns; output carries all columns of both inputs.
    *
    * @param broadcastIntervals hint the exploded interval side as
    *        broadcast — use when intervals are dimension-sized.
    * @param salts for the SHUFFLE path only (requires
    *        `broadcastIntervals = false` — asking for salts the
    *        broadcast path would ignore is an error, not a no-op):
    *        spread each bin over this many sub-keys
    *        ([[Skew.saltedJoin]]) when real data piles onto a hot bin
    *        (flash sale hour, midnight batch stamps). The salt hashes
    *        ALL point columns, so even a bin full of one repeated
    *        timestamp spreads as long as the rows differ anywhere.
    *        The broadcast path never shuffles on the bin, so it needs
    *        no salting.
    */
  def pointInInterval(
      intervals: DataFrame,
      points: DataFrame,
      loTs: String,
      hiTs: String,
      pointTs: String,
      binSeconds: Long = 86400L,
      broadcastIntervals: Boolean = true,
      salts: Int = 1): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(salts == 1 || !broadcastIntervals,
      "salts only applies to the shuffle path — pass broadcastIntervals = false")
    // internal working columns — refuse input that would silently collide
    val clash = (intervals.columns ++ points.columns).intersect(Seq("_gbin", "_salt"))
    require(clash.isEmpty,
      s"pointInInterval uses internal column(s) ${clash.mkString(", ")}; rename them in the input first")
    // cast: fixture timestamps are TIMESTAMP_NTZ, unix_seconds wants LTZ.
    // Bin values are engine-internal (only equality matters), so the
    // session-timezone interpretation of the cast is harmless.
    def bin(c: Column): Column = floor(unix_seconds(c.cast("timestamp")) / binSeconds)
    val binned = intervals.withColumn(
      "_gbin", explode(sequence(bin(col(loTs)), bin(col(hiTs)))))
    val pts = points.withColumn("_gbin", bin(col(pointTs)))
    // salt from EVERY point column: a hot bin of one repeated timestamp
    // (midnight batch stamps) would get zero spread from hash(pointTs)
    val saltSrc = struct(points.columns.map(col): _*)
    val joined =
      if (broadcastIntervals) pts.join(broadcast(binned), Seq("_gbin"))
      else if (salts > 1) Skew.saltedJoin(pts, binned, "_gbin", salts, saltSrc)
      else pts.join(binned, Seq("_gbin"))
    joined
      .where(col(pointTs) >= col(loTs) && col(pointTs) <= col(hiTs))
      .drop("_gbin")
  }
}
