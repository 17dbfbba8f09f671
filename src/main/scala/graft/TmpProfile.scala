package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextStats}

object TmpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    d.count()
    val bench = d.where(col("doc_id") % 17 === 0)
    val kept = d.where(col("doc_id") % 17 =!= 0)
      .where(TextStats.nWords(col("text")).cast("long") >= 20 &&
        col("n_chars") <= 450 && TextStats.stopwordRatio(col("text")) >= 0.02)
    kept.count()
    val benchGrams = Dedup.shingles(bench, "doc_id", "text", 8)
      .select("shingle").distinct()
    t("benchGrams.count")(benchGrams.count())
    val corpusGrams = Dedup.shingles(kept, "doc_id", "text", 8)
    t("corpusGrams.count")(corpusGrams.count())
    t("corpusGrams.count again")(corpusGrams.count())
    val joined = corpusGrams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1L))), Seq("shingle"), "left")
    t("joined.count")(joined.count())
    val perDoc = joined.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
    t("perDoc.count")(perDoc.count())
    val full = kept.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
    t("full.count")(full.count())
    spark.stop()
  }
}
