package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Structural invariants of the curation family — properties the DuckDB
  * oracle equality can't express on its own. */
class CurationSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("fixture-cached round-trips are idempotent: a repeated call returns identical rows") {
    // the bench's rep contract for the BuiltFixtures queries: the
    // second call (cache hit — no rebuild) must serve exactly the
    // first call's rows, and the change-feed/time-travel pair must
    // stay internally consistent across the hit
    for (name <- Seq("q_change_feed", "q_time_travel", "q_compact_inc",
        "q_maintain_stats", "q_skip_lookup")) {
      val first = Registry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      val again = Registry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      assert(first === again, s"$name drifted across a fixture-cache hit")
      assert(first.nonEmpty, s"$name returned no rows")
    }
  }

  test("split: train+test partition the corpus, and the split is stable across runs") {
    val rows = Registry.queries("q_split_train_test")(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = Tables.documents(spark, dir).count()
    assert(total === docs) // every doc lands in exactly one split
    val again = Registry.queries("q_split_train_test")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq) // deterministic
    // 90/10-ish: train strictly dominates per lang where both exist
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.values.foreach { rs =>
      val m = rs.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      if (m.contains("train") && m.contains("test")) assert(m("train") > m("test"))
    }
  }

  test("pack_docs: packs conserve tokens and pack ids are dense from 0") {
    val packs = Registry.queries("q_pack_docs")(spark, dir).collect()
    val packedTokens = packs.map(_.getAs[Long]("pack_tokens")).sum
    val trueTokens = Tables.documents(spark, dir)
      .select(sum(size(split(col("text"), " ", -1)).cast("long")))
      .head().getLong(0)
    assert(packedTokens === trueTokens) // nothing dropped or double-packed
    packs.groupBy(_.getAs[String]("lang")).values.foreach { rs =>
      val ids = rs.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head === 0L)
      assert(ids.toSeq === (0L until ids.length).toSeq, "pack ids must be dense")
    }
  }

  test("stratified sample: exactly n per group, deterministic, a true subset") {
    val docs = Tables.documents(spark, dir)
    val sampled = graft.operators.Curation.stratifiedSample(docs, "lang", "doc_id", 3)
    val perGroup = sampled.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val available = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    perGroup.foreach { case (g, n) => assert(n === math.min(3L, available(g))) }
    assert(perGroup.keySet === available.keySet) // no stratum dropped
    val ids = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val again = graft.operators.Curation.stratifiedSample(docs, "lang", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === again, "hash order must be run-stable")
    // groups smaller than n are taken whole, never padded
    val tiny = graft.operators.Curation.stratifiedSample(
      docs.where(col("doc_id") < 2), "lang", "doc_id", 5)
    assert(tiny.count() === docs.where(col("doc_id") < 2).count())
  }

  test("domain mix fractions sum to 1 and weights stay in 1..3") {
    val rows = Registry.queries("q_domain_mix")(spark, dir).collect()
    val fracSum = rows.map(_.getAs[Double]("mix_frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-4, s"mix fractions sum to $fracSum")
    rows.foreach { r =>
      val w = r.getAs[Long]("weight")
      assert(w >= 1 && w <= 3)
      assert(r.getAs[Long]("w_tokens") === w * r.getAs[Long]("n_tokens"))
    }
  }

  test("decontaminate counts only training docs (eval set never flags itself)") {
    val flagged = Registry.queries("q_decontaminate")(spark, dir)
      .agg(sum("n_contaminated")).head().getLong(0)
    val trainDocs = Tables.documents(spark, dir).where(col("doc_id") >= 20).count()
    assert(flagged <= trainDocs)
    assert(flagged > 0, "synthetic corpus shares vocabulary; expect hits")
  }
}
