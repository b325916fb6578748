package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: each left row gets the latest right row at or before its time") {
    val left = Seq(
      ("A", 0L, 100L), ("A", 1L, 101L), ("A", 3L, 102L), ("A", 7L, 103L),
      ("B", 5L, 200L)) // B has no right rows
      .toDF("k", "t_us", "lid")
    val right = Seq(
      ("A", 1L, 11L, 1.5), ("A", 5L, 12L, 2.5))
      .toDF("k", "rt_us", "rid", "v")

    val out = AsofJoin.asof(left, right, key = "k",
      leftTime = "t_us", rightTime = "rt_us",
      rightCols = Seq("rid", "v"), rightTieBreak = "rid")
      .collect().map(r => r.getLong(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)))).toMap

    assert(out(100L) === (None, None))            // before any right row
    assert(out(101L)._1 === Some(11L))            // inclusive <= at t=1
    assert(out(102L)._1 === Some(11L))            // carried forward
    assert(out(103L)._1 === Some(12L))            // latest at t=7
    assert(out(200L) === (None, None))            // key with no right side
  }

  test("asof: a NULL payload column in the latest right row arrives atomically") {
    // right row at t=5 has v = NULL; the result for a left row at t=7
    // must be (rid=12, v=NULL) — NOT rid 12 stitched with the OLDER
    // row's non-null v=1.5 (the per-column-carry bug)
    val left = Seq(("A", 7L, 1L)).toDF("k", "t_us", "lid")
    val right = Seq(
      ("A", 1L, 11L, Option(1.5)),
      ("A", 5L, 12L, Option.empty[Double]))
      .toDF("k", "rt_us", "rid", "v")
    val row = AsofJoin.asof(left, right, "k", "t_us", "rt_us",
      Seq("rid", "v"), "rid").collect().head
    assert(row.getLong(3) === 12L)
    assert(row.isNullAt(4))
  }

  test("asof: ties on (key, time) resolve to the max tie-break row") {
    val left = Seq(("A", 10L, 1L)).toDF("k", "t_us", "lid")
    val right = Seq(("A", 10L, 5L, 0.1), ("A", 10L, 9L, 0.2))
      .toDF("k", "rt_us", "rid", "v")
    val row = AsofJoin.asof(left, right, "k", "t_us", "rt_us",
      Seq("rid", "v"), "rid").collect().head
    assert(row.getLong(3) === 9L)
    assert(row.getDouble(4) === 0.2)
  }
}
