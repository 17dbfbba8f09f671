package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd vector kernels for the similarity operators.
  *
  * The built-in higher-order functions (`aggregate`, `zip_with`) evaluate
  * their lambdas interpreted — per element, per row — which dominates the
  * similarity queries' runtime once candidate counts grow. These
  * expressions compile to tight primitive loops inside whole-stage
  * codegen (SURVEY.md §2.8: custom `Expression` only where built-ins
  * fall short — this is that case).
  *
  * Determinism contract: [[DotProduct]] accumulates STRICTLY sequentially
  * (i = 0..n-1), matching both the previous `aggregate`-fold plan shape
  * and DuckDB's evaluation order, so oracle comparisons stay
  * bit-identical.
  */
object VectorExpressions {

  def dotProduct(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def signProjection(vec: Column, table: Int, nPlanes: Int): Column =
    GraftExpressionBridge.column(
      SignProjection(GraftExpressionBridge.expression(vec), table, nPlanes))

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    GraftExpressionBridge.column(
      WinnowFingerprint(GraftExpressionBridge.expression(text), k, w))

  def ngramProfileCount(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftExpressionBridge.column(
      NgramProfileCount(GraftExpressionBridge.expression(text), profiles))

  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    GraftExpressionBridge.column(
      NearestCells(GraftExpressionBridge.expression(vec), centroids, nProbe))

  def repetitionStats(text: Column): Column =
    GraftExpressionBridge.column(
      RepetitionStats(GraftExpressionBridge.expression(text)))
}

/** Σ a(i)·b(i), sequential order, double precision. Inputs must be
  * `array<double>` (cast upstream); null array → null result; a LENGTH
  * MISMATCH also yields null — same surfacing-of-corruption semantics as
  * the `zip_with` fold it replaced (which null-padded the short side and
  * poisoned the sum) rather than silently scoring a truncated vector.
  * Arrays must not contain null elements. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true // element nullability irrelevant
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length) return null
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $x.length; $i++) { $s += $x[$i] * $y[$i]; }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Deterministic Gaussian hyperplane families for sign-LSH, re-derived
  * from a (table, plane)-keyed seed ONCE PER JVM and never put in a
  * plan: an earlier form carried the planes as expression fields, which
  * put `tables × nPlanes × MaxDim` boxed doubles into the plan tree —
  * ~0.5M doubles at 4×32, paid on every Catalyst equals/hashCode pass
  * and re-shipped as a multi-MiB task binary with EVERY stage (the
  * "Broadcasting large task binary" warning). Seeding by table makes
  * the LSH tables draw INDEPENDENT hyperplanes (a shared plane prefix
  * would make later tables' collisions a subset of table 0's). The
  * seed formula is part of the engine's determinism contract — the
  * pinned LSH oracle values depend on it; do not change it. */
object LshPlanes {
  /** Supported vector width cap. A WIDER vector raises a clear kernel
    * error (silent first-MaxDim truncation would degrade buckets
    * invisibly); SHORTER vectors are fine — projecting on the first
    * dim Gaussian components is distributionally identical to drawing
    * planes at dim. */
  val MaxDim = 2048

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(Int, Int), Array[Array[Double]]]

  def family(table: Int, nPlanes: Int): Array[Array[Double]] =
    cache.getOrElseUpdate((table, nPlanes),
      Array.tabulate(nPlanes) { p =>
        val rnd = new java.util.Random(
          0x9e3779b97f4a7c15L ^ (table.toLong << 20) ^ p.toLong)
        Array.fill(MaxDim)(rnd.nextGaussian())
      })
}

/** Random-hyperplane sign bits: bit p of the result is set iff
  * vec · planes(p) ≥ 0. One pass over the vector per plane, all planes
  * in one expression — the whole LSH bucket key in a single codegen'd
  * kernel instead of nPlanes interpreted folds. The plane family is
  * NOT an expression field: the expression carries only
  * `(table, nPlanes)` and derives the planes per JVM via [[LshPlanes]]
  * (see there for why — plan weight and task-binary size). */
case class SignProjection(child: Expression, table: Int, nPlanes: Int)
    extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 64, "1..64 planes per bucket key")

  @transient private lazy val matrix: Array[Array[Double]] =
    LshPlanes.family(table, nPlanes)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_sign_projection expects array<double>, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_projection"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    // A vector SHORTER than the planes is fine (projecting on the first
    // dim Gaussian components ≡ drawing planes at dim); a LONGER vector
    // would be silently truncated — reject it loudly instead.
    if (v.length > matrix(0).length)
      throw new IllegalArgumentException(
        s"graft_sign_projection: vector dim ${v.length} exceeds the plane " +
          s"family dim ${matrix(0).length} (Similarity.MaxDim) — raise MaxDim " +
          "or reduce the embedding")
    var bits = 0L
    var p = 0
    while (p < matrix.length) {
      val w = matrix(p)
      val n = math.min(v.length, w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v(i) * w(i); i += 1 }
      if (s >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NOT addReferenceObj: a referenced matrix is serialized into every
    // stage's task binary (~64 KiB × tables per query side at 4×32).
    // The executor derives the family locally instead — LshPlanes is a
    // per-JVM cache behind a static forwarder, so this init runs the
    // Gaussian generation at most once per (table, nPlanes) per JVM.
    val mat = ctx.addMutableState("double[][]", "lshPlanes",
      v => s"$v = graft.functions.LshPlanes.family($table, $nPlanes);")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |double[] $v = $c.toDoubleArray();
         |if ($v.length > $mat[0].length) {
         |  throw new IllegalArgumentException(
         |    "graft_sign_projection: vector dim " + $v.length +
         |    " exceeds the plane family dim " + $mat[0].length +
         |    " (Similarity.MaxDim) — raise MaxDim or reduce the embedding");
         |}
         |long $bits = 0L;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double[] $w = $mat[$p];
         |  int $n = Math.min($v.length, $w.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $v[$i] * $w[$i]; }
         |  if ($s >= 0.0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignProjection =
    copy(child = newChild)
}

/** Winnowed document fingerprints (Schleimer et al., SIGMOD'03) with a
  * Rabin-Karp ROLLING hash: O(n) per document — each character enters
  * and leaves the k-gram hash once — where the equivalent higher-order-
  * function formulation (`transform` over windows of a `transform` over
  * grams) re-inlines the gram array per window and goes O(n²·k)
  * (measured 246 s vs <1 s on the 500-doc corpus).
  *
  * Output: distinct window-minimum hashes in first-selection order.
  * Text is lowercased; docs shorter than k+w-1 bytes yield an empty
  * array. Interpreted eval (CodegenFallback): the per-row loop IS the
  * work; codegen would only inline the call. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects string, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  /** Avalanche finalizer (splitmix64): spreads the polynomial hash so
    * window-minimum selection is unbiased. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.getBytes
    val n = bytes.length
    if (n < k + w - 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    val B = 257L
    var pow = 1L // B^(k-1)
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val grams = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    grams(0) = mix(h)
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * B + (bytes(i + k - 1) & 0xff)
      grams(i) = mix(h)
      i += 1
    }
    // winnow: record each window's min once (w is small → direct scan)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    val nWindows = nGrams - w + 1
    var j = 0
    while (j < nWindows) {
      var m = grams(j)
      var i = j + 1
      while (i < j + w) { if (grams(i) < m) m = grams(i); i += 1 }
      if (seen.add(m)) out += m
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Per-profile n-gram hit counts in ONE pass over the lowercased text:
  * output(i) = number of positions whose n-gram is in profiles(i). All
  * profiles' grams must share one length. The higher-order-function
  * formulation (per-language `filter` over a `transform`ed trigram
  * array) re-inlines the array build per language and allocates every
  * n-gram as a string — measured 28 s vs ~1 s on the 5000-doc corpus.
  * Semantics identical to counting over `transform(sequence…substr)`:
  * overlapping occurrences count, comparison is exact. */
case class NgramProfileCount(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(profiles.nonEmpty, "need at least one profile")
  private val n = profiles.head.head.length
  require(profiles.flatten.forall(_.length == n), "profile grams must share one length")

  /** gram → indices of the profiles containing it. */
  @transient private lazy val index: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((p, i) <- profiles.zipWithIndex; g <- p) {
      val prev = Option(m.get(g)).getOrElse(Array.empty[Int])
      m.put(g, prev :+ i)
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_profile_count expects string, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_profile_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString
    // Window over CODE POINTS, not UTF-16 code units: DuckDB's substr /
    // list_transform (the oracle) and Spark's own substring are
    // code-point-based, so a supplementary-plane char must occupy ONE
    // window position, not two.
    val cps = s.codePoints().toArray
    val counts = new Array[Long](profiles.size)
    var i = 0
    val last = cps.length - n
    while (i <= last) {
      val hit = index.get(new String(cps, i, n))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramProfileCount =
    copy(child = newChild)
}

/** Indices of the `nProbe` nearest centroids by dot product, descending
  * (centroids are unit-normalized at training time, so dot ranking ≡
  * cosine ranking), in one codegen'd pass: the whole IVF cell-assign /
  * probe step per row, no centroid table join. Ties keep the LOWER
  * centroid index (strict comparisons throughout) — deterministic across
  * retries and engines. A vector whose dim differs from the centroids'
  * is corruption (the model was trained on this corpus), surfaced as an
  * error rather than a silently wrong cell. */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]],
                        nProbe: Int) extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")
  require(nProbe >= 1 && nProbe <= centroids.size,
    s"nProbe must be in [1, ${centroids.size}]")
  require(centroids.forall(_.length == centroids.head.length),
    "centroid rows must share one dim")

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_cells expects array<double>, got ${t.sql}")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    if (v.length != matrix(0).length)
      throw new IllegalArgumentException(
        s"graft_nearest_cells: vector dim ${v.length} != centroid dim " +
          s"${matrix(0).length} — the IVF model was trained on a different embedding")
    val bestIdx = new Array[Int](nProbe)
    val bestS = new Array[Double](nProbe)
    var filled = 0
    var p = 0
    while (p < matrix.length) {
      val w = matrix(p)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * w(i); i += 1 }
      if (filled < nProbe) {
        var j = filled; filled += 1
        while (j > 0 && bestS(j - 1) < s) {
          bestS(j) = bestS(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestS(j) = s; bestIdx(j) = p
      } else if (s > bestS(nProbe - 1)) {
        var j = nProbe - 1
        while (j > 0 && bestS(j - 1) < s) {
          bestS(j) = bestS(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestS(j) = s; bestIdx(j) = p
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestIdx, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      val bi = ctx.freshName("bestIdx")
      val bs = ctx.freshName("bestS")
      val filled = ctx.freshName("filled")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |double[] $v = $c.toDoubleArray();
         |if ($v.length != $mat[0].length) {
         |  throw new IllegalArgumentException(
         |    "graft_nearest_cells: vector dim " + $v.length +
         |    " != centroid dim " + $mat[0].length +
         |    " — the IVF model was trained on a different embedding");
         |}
         |int[] $bi = new int[$nProbe];
         |double[] $bs = new double[$nProbe];
         |int $filled = 0;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double[] $w = $mat[$p];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $v.length; $i++) { $s += $v[$i] * $w[$i]; }
         |  if ($filled < $nProbe) {
         |    int $j = $filled++;
         |    while ($j > 0 && $bs[$j-1] < $s) {
         |      $bs[$j] = $bs[$j-1]; $bi[$j] = $bi[$j-1]; $j--;
         |    }
         |    $bs[$j] = $s; $bi[$j] = $p;
         |  } else if ($s > $bs[$nProbe - 1]) {
         |    int $j = $nProbe - 1;
         |    while ($j > 0 && $bs[$j-1] < $s) {
         |      $bs[$j] = $bs[$j-1]; $bi[$j] = $bi[$j-1]; $j--;
         |    }
         |    $bs[$j] = $s; $bi[$j] = $p;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Gopher-style repetition counters in ONE pass over the lowercased,
  * space-trimmed, whitespace-split text:
  * `[n_words, top_word_count, repeated_word_count, n_bigrams,
  * top_bigram_count]` — the inputs to duplicate-word / top-n-gram
  * fraction quality filters. Per-row hash counting IS the work
  * (CodegenFallback, same argument as [[NgramProfileCount]]); the
  * map-side single pass is the 100 TB shape — the equivalent
  * explode → groupBy(doc, word) shuffles the entire corpus's words.
  * Splitting/lowering/trimming mirror `regexp_split_to_array(
  * trim(lower(text)), '\s+')` exactly: space-only trim, and the split
  * class is RE2's `\s` = [\t\n\f\r ] spelled out LITERALLY — Java's
  * `\s` also matches vertical tab (\x0B), which RE2's does not, so
  * using Java `\s` would silently diverge from the oracle on \x0B. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_repetition_stats expects string, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString
    // space-only trim, matching SQL trim() in Spark and DuckDB (Java's
    // String.trim would also strip \t\n and diverge from the oracle)
    var st = 0
    var en = lowered.length
    while (st < en && lowered.charAt(st) == ' ') st += 1
    while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
    val t = lowered.substring(st, en)
    if (t.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill(5)(0L))
    // RE2's \s, NOT Java's (see scaladoc). limit = -1 keeps trailing empty
    // tokens: after the space-only trim, text ending in \t\n\f\r still has a
    // trailing separator, and DuckDB's regexp_split_to_array emits the empty
    // token after it ("a b\t" -> [a, b, ""]). Java's default limit-0 split
    // drops trailing empties only (leading already match), so limit -1 is
    // required for oracle parity.
    val ws = t.split("[\t\n\f\r ]+", -1)
    val wc = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < ws.length) { wc.merge(ws(i), 1L, _ + _); i += 1 }
    var topW = 0L
    var repeated = 0L
    wc.values.forEach { c =>
      if (c > topW) topW = c
      if (c > 1) repeated += c
    }
    val nBigrams = math.max(ws.length - 1, 0).toLong
    var topB = 0L
    if (nBigrams > 0) {
      val bc = new java.util.HashMap[String, Long]()
      i = 1
      while (i < ws.length) {
        bc.merge(ws(i - 1) + " " + ws(i), 1L, _ + _)
        i += 1
      }
      bc.values.forEach { c => if (c > topB) topB = c }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(ws.length.toLong, topW, repeated, nBigrams, topB))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
