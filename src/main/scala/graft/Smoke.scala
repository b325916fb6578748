package graft

import org.apache.spark.sql.SparkSession

/** Drives the driver's t1 smoke surface: SparkEntry.entry at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")

    // retrieval-surface drive: ingest sf0.001 docs+embeddings, search
    val lake = Lake(spark, LakeConfig(
      s"${sys.props("java.io.tmpdir")}/graft_smoke_lake", dim = 64))
    lake.delete()
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = lake.addTexts(e.join(d, e("vec_id") === d("doc_id"))
      .select(d("text"), e("embedding")))
    val hits = lake.similaritySearch(Fixtures.queryVec, 3).collect()
    println(s"[smoke] lake ingested=$n similaritySearch hits=${hits.length}")
    hits.foreach(r => println(s"[smoke] dist=${r.getAs[Double]("dist")} doc='${r.getAs[String]("document").take(40)}…'"))
    require(hits.nonEmpty, "similaritySearch returned 0 rows")
    spark.stop()
  }
}
