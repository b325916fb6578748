package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Structural invariants of the curation family — properties the DuckDB
  * oracle equality can't express on its own. */
class CurationSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

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

  test("decontaminate counts only training docs (eval set never flags itself)") {
    val flagged = Registry.queries("q_decontaminate")(spark, dir)
      .agg(sum("n_contaminated")).head().getLong(0)
    val trainDocs = Tables.documents(spark, dir).where(col("doc_id") >= 20).count()
    assert(flagged <= trainDocs)
    assert(flagged > 0, "synthetic corpus shares vocabulary; expect hits")
  }
}
