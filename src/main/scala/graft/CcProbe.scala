package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the q_dedup_clusters phases (optimization round):
  * times sigs-cut, pair generation, and the ConnectedComponents loop
  * separately so the iterative overhead is visible in isolation.
  * Usage: runMain graft.CcProbe [sfDir] [reps]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    (0 until reps).foreach { r =>
      println(s"rep $r")
      val sigs = t("sigs+cut") {
        graft.operators.TextDedup
          .minhashSignatures(Tables.documents(spark, sfDir), "doc_id", "text",
            shingleN = 2, k = 64)
          .transform(graft.operators.Materialize.cut(_))
      }
      val pairs = t("pairs(count)") {
        val p = graft.operators.TextDedup
          .jaccardVerify(graft.operators.TextDedup.bandedCandidates(sigs, 64, 16), sigs, 0.2)
          .select("a_id", "b_id")
        println(s"    n_pairs=${p.count()}")
        p
      }
      val comp = t("components") {
        graft.operators.ConnectedComponents.components(pairs)
      }
      // instrumented copy of the CC loop: per-round costs
      t("cc-instrumented") {
        val cut: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          graft.operators.Materialize.cutter(None, "ccprobe-step")
        val sym = t("  cut(sym)") { cut(pairs
          .select(col("a_id").as("src"), col("b_id").as("dst"))
          .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
          .distinct()) }
        var labels = t("  cut(labels0)") { cut(sym.select(col("src").as("id")).distinct()
          .withColumn("component", col("id"))) }
        var changed = 1L; var i = 0
        while (changed > 0 && i < 25) {
          val neighborMin = sym
            .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(min("nc").as("nmin"))
          val updated = t(s"  round$i cut") { cut(labels
            .join(neighborMin, Seq("id"), "left")
            .select(col("id"), col("component").as("_old"),
              least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))) }
          changed = t(s"  round$i count") {
            updated.where(col("component") =!= col("_old")).count() }
          labels = updated.select("id", "component")
          i += 1
        }
        labels.count()
      }
      t("final agg") {
        comp.groupBy("component")
          .agg(count(lit(1)).as("n_docs"), min("id").as("min_doc"), max("id").as("max_doc"))
          .orderBy("component").count()
      }
    }
    spark.stop()
  }
}
