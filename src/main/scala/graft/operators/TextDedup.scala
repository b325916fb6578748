package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** The text near-dup family as a reusable operator API — the same
  * programs the oracle-checked registry queries run
  * ([[graft.queries.DedupQueries]] delegates here, so the DuckDB gate
  * proves THIS code), callable on any (id, text) frame.
  *
  * Scale shape: signatures are one fused-kernel scan; banding turns
  * all-pairs candidate generation into an equi-join on band keys where
  * only (band, id) crosses the shuffle; exact Jaccard verification
  * re-joins the hash sets by id after candidate dedup. */
object TextDedup {

  /** Per-doc MinHash signature table: (id, hsd = distinct shingle-hash
    * set, mh = k-element signature array). `localCheckpoint` it before
    * feeding both sides of a self-join. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, k: Int = 16, seed: Long = 13L): DataFrame = {
    val params = T.minhashParams(k, seed)
    docs
      .select(col(idCol).as("doc_id"), T.shingleHashes(col(textCol), shingleN).as("hs"))
      .select(col("doc_id"), array_distinct(col("hs")).as("hsd"),
        T.minhashSigArr(col("hs"), params).as("mh"))
  }

  /** LSH-banded candidate pairs (a_id < b_id, distinct): only
    * (band, id) crosses the join and the distinct. `sigs` must come
    * from [[minhashSignatures]] with signature length k (checkpoint it
    * first for one scan); k/bands signature rows per band. */
  def bandedCandidates(sigs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPerBand = k / bands
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("-", lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(col("mh"), b * rowsPerBand + r + 1)): _*)
    }: _*)
    // empty-shingle docs have an all-null signature; concat_ws SKIPS
    // nulls, so without this filter every such doc would share the bare
    // band keys "0".."3" and pair with all other empty docs (quadratic
    // blowup, only caught later by NaN jaccard) — while the SQL oracle's
    // `||` yields NULL bands and no pairs. Drop them before banding:
    // no shingles ⇒ nothing to near-dup against.
    val exploded = sigs.where(size(col("hsd")) > 0)
      .select(col("doc_id"), explode(bandKeys).as("band"))
    val a = exploded.select(col("band"), col("doc_id").as("a_id"))
    val b = exploded.select(col("band"), col("doc_id").as("b_id"))
    a.join(b, Seq("band"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact Jaccard over the hashed shingle sets for candidate pairs —
    * the verification stage after banding. */
  def jaccardVerify(pairs: DataFrame, sigs: DataFrame, threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("a_h"), col("b_h"))).cast("double")
    pairs
      .join(sigs.select(col("doc_id").as("a_id"), col("hsd").as("a_h")), Seq("a_id"))
      .join(sigs.select(col("doc_id").as("b_id"), col("hsd").as("b_h")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(inter / (size(col("a_h")) + size(col("b_h")) - inter), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 16-bit (default) SimHash fingerprint column over whitespace tokens. */
  def simhashCol(textCol: Column, bits: Int = 16): Column =
    T.simhashFromHashes(T.hashes31(array_distinct(T.tokens(textCol))), bits)

  /** Dedup ACTION: within each SimHash bucket keep the best row by
    * `scoreCol` (desc, id tiebreak); returns the input columns plus
    * `kept` (true for the bucket winner). */
  def keepBestBySimhash(docs: DataFrame, idCol: String, textCol: String,
      scoreCol: Column, bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("simhash").orderBy(col("_score").desc, col(idCol))
    docs
      .withColumn("simhash", simhashCol(col(textCol), bits))
      .withColumn("_score", scoreCol)
      .withColumn("kept", row_number().over(w) === 1)
      .drop("_score")
  }
}
