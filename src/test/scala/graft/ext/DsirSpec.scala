package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val real = "/root/testdata/sf0.001/documents.parquet"

  private def topIds(scored: DataFrame, k: Int): Set[Long] =
    scored.orderBy(col("score_bits").desc, col("doc_id")).limit(k)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("target-like raw docs outscore alien-vocabulary raw docs") {
    val target = df(1L -> "clean prose about science and method",
      2L -> "clean prose about careful method")
    val raw = df(
      10L -> "clean prose about science method", // target-like
      11L -> "zzz qqq www spam spam zzz qqq")    // alien
    val s = Dsir.score(target, raw, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(s.length === 2)
    val like = s(0).getAs[Long]("score_bits").toDouble / s(0).getAs[Long]("n_features")
    val alien = s(1).getAs[Long]("score_bits").toDouble / s(1).getAs[Long]("n_features")
    assert(like > alien,
      s"target-like should outscore alien: $like vs $alien")
  }

  test("select keeps exactly k under the (score DESC, id) total order") {
    val all = spark.read.parquet(real)
    val sel = Dsir.select(all.where(col("lang") === "en"),
      all.where(col("lang") =!= "en"), "doc_id", "text", k = 50)
    val rows = sel.collect()
    assert(rows.length === 50)
    // re-derive from the full scoring: identical set
    val full = Dsir.score(all.where(col("lang") === "en"),
      all.where(col("lang") =!= "en"), "doc_id", "text")
    assert(rows.map(_.getLong(0)).toSet === topIds(full, 50))
  }

  test("hashed scorer: model is exactly <= B rows, counts survive bucketing") {
    val all = spark.read.parquet(real)
    val t = all.where(col("lang") === "en")
    val r = all.where(col("lang") =!= "en")
    val exact = Dsir.score(t, r, "doc_id", "text")
      .select("doc_id", "n_features")
    val hashed = Dsir.scoreHashed(t, r, "doc_id", "text", buckets = 1024)
    // bucketing mixes STATISTICS, never loses occurrences: per-doc
    // feature counts are identical
    val diff = exact.join(hashed.select(col("doc_id"),
        col("n_features").as("nh")), "doc_id")
      .where(col("n_features") =!= col("nh")).count()
    assert(diff === 0L)
  }

  test("hashed top-50 tracks exact top-50, improving with B (fixture-pinned floors)") {
    val all = spark.read.parquet(real)
    val t = all.where(col("lang") === "en")
    val r = all.where(col("lang") =!= "en")
    val ex = topIds(Dsir.score(t, r, "doc_id", "text"), 50)
    val h4k = topIds(Dsir.scoreHashed(t, r, "doc_id", "text", 4096), 50)
    val h64k = topIds(Dsir.scoreHashed(t, r, "doc_id", "text", 65536), 50)
    // measured 41 and 50 on this fixture; floors leave noise margin
    assert((ex intersect h4k).size >= 35, s"4k overlap ${(ex intersect h4k).size}")
    assert((ex intersect h64k).size >= 45, s"64k overlap ${(ex intersect h64k).size}")
  }

  test("plans: feature text never a shuffle key; hashed model broadcasts") {
    val all = spark.read.parquet(real)
    val t = all.where(col("lang") === "en")
    val r = all.where(col("lang") =!= "en")
    val pe = Dsir.score(t, r, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(feat#".r.findAllIn(pe).isEmpty,
      s"feature TEXT is a shuffle key:\n$pe")
    assert(!pe.contains("CartesianProduct"), s"cartesian in exact scorer:\n$pe")
    val ph = Dsir.scoreHashed(t, r, "doc_id", "text", 4096)
      .queryExecution.executedPlan.toString
    assert(ph.contains("BroadcastHashJoin"),
      s"hashed model should broadcast:\n$ph")
  }
}
