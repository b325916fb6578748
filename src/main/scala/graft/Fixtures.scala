package graft

/** Deterministic fixture constants shared by queries and their DuckDB
  * oracles (SURVEY.md §7.3-7.5). Everything literal/seeded — no runtime
  * randomness — so Spark results hash-match the oracle.
  */
object Fixtures {
  /** The flagship literal query vector: 64 dims, seeded Gaussian scaled
    * to ≈ the testdata embedding magnitude (N(0, 0.15), FIXTURES.md §B). */
  val queryVec: Seq[Double] = {
    val rng = new java.util.Random(7L)
    Seq.fill(64)(rng.nextGaussian() * 0.15)
  }

  /** A second query vector for multi-query fixtures. */
  val queryVec2: Seq[Double] = {
    val rng = new java.util.Random(11L)
    Seq.fill(64)(rng.nextGaussian() * 0.15)
  }
}
