package graft.util

import org.apache.spark.sql.DataFrame

/** O5 debug sampling (`/root/reference/glue/cdc_hudi.py:105-113`): the
  * reference logs `schema.treeString` + 5 sample rows at each pipeline
  * stage via py4j internals; this is the public-API equivalent. Sampling
  * uses `take(n)` — a LocalLimit that short-circuits the scan, never a
  * full materialization. */
object Debug {

  def dfExampleString(df: DataFrame, n: Int = 5, truncate: Int = 20): String = {
    val rows = df.take(n).map { r =>
      r.toSeq.map { v =>
        val s = String.valueOf(v)
        if (truncate > 0 && s.length > truncate) s.take(truncate - 3) + "..." else s
      }.mkString("[", ", ", "]")
    }
    df.schema.treeString + rows.mkString("\n")
  }
}
