package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comp(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to one component labeled by its min id") {
    // 1-2, 2-3, 3-4: diameter 3, needs multiple propagation rounds
    val c = comp(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val c = comp(Seq((5L, 9L), (2L, 7L), (7L, 3L)))
    assert(c(5L) === 5L && c(9L) === 5L)
    assert(c(2L) === 2L && c(7L) === 2L && c(3L) === 2L)
  }

  test("a cycle converges") {
    val c = comp(Seq((1L, 2L), (2L, 3L), (3L, 1L), (8L, 9L)))
    assert(c(1L) === 1L && c(2L) === 1L && c(3L) === 1L)
    assert(c(8L) === 8L && c(9L) === 8L)
  }

  test("empty edge set yields empty labeling") {
    assert(comp(Seq.empty).isEmpty)
  }

  test("maxIter bound is exact: convergence ON the last round passes, one past throws") {
    // chain 0-1-2-3-4-5: node 5 takes label 0 on round 5 exactly
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val ok = ConnectedComponents.components(chain, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet === Set(0L)) // fully converged, no throw
    intercept[IllegalStateException] {
      ConnectedComponents.components(chain, maxIter = 4).collect()
    }
  }

  test("reliable-checkpoint mode produces the same labeling and writes to the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val c = ConnectedComponents.components(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 8L)).toDF("a_id", "b_id"),
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 8L -> 8L, 9L -> 8L))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(p).nonEmpty) // checkpoints actually went to disk
  }

  test("hitting maxIter before the fixpoint throws instead of returning split labels") {
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(chain, maxIter = 1)
    }
    assert(e.getMessage.contains("converge"))
  }
}
