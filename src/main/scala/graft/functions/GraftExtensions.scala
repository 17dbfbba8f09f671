package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's custom expressions, registered through the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * Gives `spark.sql` users the same kernels the Column API uses:
  *  - `graft_dot(array<double>, array<double>) → double`
  *  - `graft_cosine(array<double>, array<double>) → double`
  *  - `graft_winnow(text, k, w) → array<bigint>` (k, w literal ints)
  *  - `graft_repetition_stats(text) → array<bigint>` ([n_words,
  *    top_word_count, repeated_words, n_bigrams, top_bigram_count])
  *  - `graft_nfc(text) → text` (Unicode NFC normalization)
  *  - `graft_strip_accents(text) → text` (NFD → drop Mn/Mc/Me → NFC)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Cast any array-typed arg to array<double> so SQL callers can pass
    * real embedding columns (array<float>) directly, matching the Column
    * API which casts at call sites. */
  private def asDoubles(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    Cast(e, ArrayType(DoubleType))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot(a, b)")
        DotProduct(asDoubles(args(0)), asDoubles(args(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_cosine(a, b)")
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (asDoubles(args(0)), asDoubles(args(1)))
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "graft_winnow"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_winnow(text, k, w)")
        WinnowFingerprint(args(0), intLit(args(1), "k"), intLit(args(2), "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName,
        "graft_repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_repetition_stats(text)")
        RepetitionStats(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_nfc(text)")
        NfcNormalize(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "graft_strip_accents"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_strip_accents(text)")
        StripAccents(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "graft_bloom_might_contain(text, '/index/bloom/filter.bin')")
        val path = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
            if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"bloom path must be a string literal, got $other")
        }
        // SQL registration runs on the driver with an active session —
        // capture its Hadoop conf for the executors, same as the
        // Column-API construction path
        BloomMightContain(args(0), path, new graft.util.SerializableHadoopConf(
          org.apache.spark.sql.SparkSession.getActiveSession
            .map(_.sparkContext.hadoopConfiguration)
            .getOrElse(new org.apache.hadoop.conf.Configuration())))
      }))
  }
}
