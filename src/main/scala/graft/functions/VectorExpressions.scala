package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}

/** Native Catalyst vector expressions.
  *
  * [[DotProduct]] computes the strict left-to-right double dot product
  * of two float/double arrays — semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)` but with real
  * whole-stage codegen: higher-order functions are CodegenFallback
  * (interpreted closures + per-row array allocation), while this emits
  * a tight primitive loop. On the brute-force similarity path that is
  * the hot inner loop at any scale.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"DotProduct needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $lGet * $rGet;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product of two `array<long>` quantization codes —
  * the int8-ANN scoring loop. Long accumulation is exact (64-dim int8
  * codes bound the sum at 64*127^2 ≈ 1.03e6, nowhere near overflow),
  * so the score is bit-identical in any integer-capable SQL engine.
  * Same codegen rationale as [[DotProduct]]: the HOF formulation
  * (`aggregate(zip_with(...))`) is CodegenFallback and allocates per
  * row; this emits a primitive long loop inside whole-stage codegen —
  * and on the candidate-generation path it touches every
  * (query, corpus) pair, the hottest loop in the operator.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def checkElem(e: Expression): Unit = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => ()
    case t => throw new IllegalArgumentException(
      s"IntDotProduct needs array<long>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    checkElem(left); checkElem(right)
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      checkElem(left); checkElem(right)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array of 64-bit token hashes: per bit
  * position, the sign of the +1/-1 votes across tokens. Equivalent to
  * 64 separate `aggregate` folds but one codegen'd pass over the array
  * with a 64-int vote table.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Native winnowing fingerprint: minimum over all `window`-char windows
  * of the polynomial hash sum(code(c_j) * base^(w-1-j)) mod modulus.
  * True O(n) rolling evaluation (incremental add/drop per step) —
  * semantically identical to TextOps.rollingFingerprint's O(n*w)
  * Column-algebra form, but codegen'd and linear for hot paths.
  * NULL for inputs shorter than the window.
  */
case class RollingMinHash(child: Expression, window: Int, base: Long,
                          modulus: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private val topPower: Long = // base^(window-1) mod modulus
    (1 until window).foldLeft(1L)((a, _) => a * base % modulus)

  override def nullSafeEval(input: Any): Any = {
    // codepoints, not UTF-16 units — matches length()/substr()/ascii()
    // semantics used by the Column-algebra twin and SQL oracles
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n < window) null
    else {
      var h = 0L
      var i = 0
      while (i < window) { h = (h * base + cps(i)) % modulus; i += 1 }
      var min = h
      while (i < n) {
        h = (h - cps(i - window) * topPower % modulus + modulus) % modulus
        h = (h * base + cps(i)) % modulus
        if (h < min) min = h
        i += 1
      }
      java.lang.Long.valueOf(min)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, str => {
      val cps = ctx.freshName("cps")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val mn = ctx.freshName("mn")
      val i = ctx.freshName("i")
      s"""
         |int[] $cps = $str.toString().codePoints().toArray();
         |int $n = $cps.length;
         |if ($n < $window) { ${ev.isNull} = true; } else {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $window; $i++) {
         |    $h = ($h * ${base}L + $cps[$i]) % ${modulus}L;
         |  }
         |  long $mn = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ($h - $cps[$i - $window] * ${topPower}L % ${modulus}L
         |      + ${modulus}L) % ${modulus}L;
         |    $h = ($h * ${base}L + $cps[$i]) % ${modulus}L;
         |    if ($h < $mn) $mn = $h;
         |  }
         |  ${ev.value} = $mn;
         |}
       """.stripMargin
    })
    res
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static helpers callable from generated code. */
object TextHashUtil {
  /** Distinct word-n-shingle hashes of `text` in one pass: tokenize on
    * whitespace (space-only trim + `\s+` split — byte-identical to
    * `split(trim(text), "\\s+")`), join every n consecutive tokens with
    * single spaces, md5 each shingle and keep the first 15 hex digits
    * as a long ([[graft.ext.TextOps.hex60]] semantics, value-identical
    * to the Column-algebra form and to SQL oracles). Deduplicates via a
    * hash set — min/equality consumers are unaffected by multiset
    * collapse. Returns an empty array for texts with < n tokens. */
  /** Word n-gram STRINGS (multiset — counting consumers need
    * multiplicities, unlike the deduplicated hash form above). Same
    * tokenization contract as [[graft.ext.TextOps.tokens]] /
    * [[shingleHex60]]: ASCII-space-only trim, `\\s+` split. One JVM
    * loop instead of the interpreted transform/sequence/concat_ws HOF
    * chain, which is CodegenFallback and ~10x slower. */
  def wordShingleStrings(s: org.apache.spark.unsafe.types.UTF8String,
                         n: Int): ArrayData = {
    val str = s.toString
    var st = 0; var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val toks = str.substring(st, en).split("\\s+", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val out = new Array[AnyRef](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** NON-overlapping word chunks of `n` tokens, short tail kept —
    * the chunking sibling of [[wordShingleStrings]] (which slides by 1
    * and drops tails). Same tokenization contract. */
  def wordChunks(s: org.apache.spark.unsafe.types.UTF8String,
                 n: Int): ArrayData = {
    val str = s.toString
    var st = 0; var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val toks = str.substring(st, en).split("\\s+", -1)
    val nChunks = (toks.length + n - 1) / n
    val out = new Array[AnyRef](nChunks)
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < nChunks) {
      sb.setLength(0)
      var j = k * n
      val lim = math.min(j + n, toks.length)
      while (j < lim) {
        if (j > k * n) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      out(k) = org.apache.spark.unsafe.types.UTF8String
        .fromString(sb.toString)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** OVERLAPPING word chunks: windows of `n` tokens advancing by
    * `stride` (< n leaves an n-stride token overlap between
    * neighbors — the RAG-chunking shape where a fact straddling a
    * boundary must land whole in at least one chunk). Chunk k covers
    * tokens [k*stride, k*stride+n); the last window starts at the
    * first offset whose window reaches the end, so every token is
    * covered and no window starts past the text. `stride == n`
    * degrades to [[wordChunks]]. Same tokenization contract. */
  def wordChunksStrided(s: org.apache.spark.unsafe.types.UTF8String,
                        n: Int, stride: Int): ArrayData = {
    val str = s.toString
    var st = 0; var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val toks = str.substring(st, en).split("\\s+", -1)
    val nChunks =
      if (toks.length <= n) 1 else 1 + (toks.length - n + stride - 1) / stride
    val out = new Array[AnyRef](nChunks)
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < nChunks) {
      sb.setLength(0)
      var j = k * stride
      val lim = math.min(j + n, toks.length)
      while (j < lim) {
        if (j > k * stride) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      out(k) = org.apache.spark.unsafe.types.UTF8String
        .fromString(sb.toString)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def shingleHex60(s: org.apache.spark.unsafe.types.UTF8String,
                   n: Int): ArrayData = {
    val str = s.toString
    // Spark/DuckDB trim() strips ASCII space ONLY (Java's trim strips
    // all control chars — subtly different, so hand-roll it)
    var st = 0; var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val toks = str.substring(st, en).split("\\s+", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = bytes 0-6 plus the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >> 4)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The Gopher rule family's 8 English stopwords (exact-token
    * membership — Rae et al. 2021 table A1's "common English words"
    * proxy, fixed by [[graft.ext.Corpus.gopherQualityFlags]]). */
  private val GopherStop8 = Array(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** Stopword lists for the n-gram language-ID heuristic — the ONE
    * source of truth ([[graft.ext.TextOps.LangStopwords]] re-exports
    * it; the SQL oracle twins embed the same words). Order is the
    * langId tie-break priority. */
  val LangStopwordLists: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "a", "of", "and", "to"),
    "es" -> Array("el", "la", "de", "que", "los"),
    "de" -> Array("der", "die", "und", "das", "ist"),
    "fr" -> Array("le", "la", "les", "et", "des"))

  /** Non-overlapping occurrences of each ` word ` in the space-padded
    * LOWERED text, summed over `words` — value-identical to the
    * replace-diff Column algebra it replaces
    * (`(length(padded) - length(regexp_replace(padded, quoted, '')))
    * / needle_len`, the [[graft.ext.TextOps.keywordHitsRef]] reference):
    * regex literal replace scans left-to-right and resumes AFTER each
    * match, which indexOf-advance-by-needle-length replicates
    * exactly (overlapping candidates like " a a " count once on
    * both). Lowercasing goes through `UTF8String.toLowerCase` — the
    * SAME implementation Spark's `lower()` uses — so exotic casings
    * fold identically. Needles are ASCII, so occurrence counting is
    * code-point-safe without code-point arithmetic. The win over the
    * Column form: ONE lower+pad per row instead of one per word, and
    * an allocation-free indexOf scan per word instead of a full
    * regex-replace STRING REBUILD per word (5 rebuilds per langScore,
    * 20 per langId). */
  def langHits(s: org.apache.spark.unsafe.types.UTF8String,
               words: Array[String]): Long = {
    val padded = " " + s.toLowerCase.toString + " "
    var total = 0L
    var w = 0
    while (w < words.length) {
      val needle = " " + words(w) + " "
      var idx = padded.indexOf(needle)
      while (idx >= 0) {
        total += 1
        idx = padded.indexOf(needle, idx + needle.length)
      }
      w += 1
    }
    total
  }

  /** Language-ID argmax over [[LangStopwordLists]] with the fixed
    * priority tie order (en > es > de > fr) — the
    * [[graft.ext.TextOps.langId]] when-chain, computed with ONE
    * lower+pad per row and [[langHits]]-semantics counts. */
  def langIdArgmax(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val padded = " " + s.toLowerCase.toString + " "
    val scores = new Array[Long](LangStopwordLists.length)
    var l = 0
    while (l < LangStopwordLists.length) {
      val words = LangStopwordLists(l)._2
      var total = 0L
      var w = 0
      while (w < words.length) {
        val needle = " " + words(w) + " "
        var idx = padded.indexOf(needle)
        while (idx >= 0) {
          total += 1
          idx = padded.indexOf(needle, idx + needle.length)
        }
        w += 1
      }
      scores(l) = total
      l += 1
    }
    val Array(en, es, de, fr) = scores
    val lang =
      if (en >= es && en >= de && en >= fr) "en"
      else if (es >= de && es >= fr) "es"
      else if (de >= fr) "de"
      else "fr"
    org.apache.spark.unsafe.types.UTF8String.fromString(lang)
  }

  /** Every raw count the Gopher quality rules need, in ONE linear pass
    * over the document — value-identical to the Column-algebra HOF
    * formulation it replaces (equality is spec-pinned against the HOF
    * reference on adversarial fixtures):
    *
    *  - tokens: ASCII-space-only trim + Java `split("\\s+", -1)` —
    *    byte-identical to `split(trim(text), "\\s+")` incl. the
    *    leading/trailing-empty-token edge cases
    *  - `sum_word_len` counts Unicode CODE POINTS per token (SQL
    *    `length()` semantics), not UTF-16 units
    *  - `n_ellipsis` counts non-overlapping left-to-right '...'
    *    occurrences — `(length(t) - length(replace(t, '...', ''))) / 3`
    *    semantics
    *  - lines: `split(text, "\n")` on the UNTRIMMED text, trailing
    *    empty kept; bullet = startsWith "- " / "* ", ellipsis line =
    *    endsWith "..."
    *  - `stop_hits`: DISTINCT membership (0/1 per stopword), exact
    *    token equality
    *
    * Struct of 9 longs: (n_words, sum_word_len, n_alpha_words,
    * n_hash, n_ellipsis, n_lines, n_bullet_lines, n_ellipsis_lines,
    * stop_hits). */
  def gopherStats(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    var st = 0; var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val toks = str.substring(st, en).split("\\s+", -1)
    var sumLen = 0L; var nAlpha = 0L
    val stopSeen = new Array[Boolean](GopherStop8.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.codePointCount(0, t.length)
      var alpha = false
      var j = 0
      while (!alpha && j < t.length) {
        val c = t.charAt(j)
        alpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        j += 1
      }
      if (alpha) nAlpha += 1
      var k2 = 0
      while (k2 < GopherStop8.length) {
        if (!stopSeen(k2) && t == GopherStop8(k2)) stopSeen(k2) = true
        k2 += 1
      }
      i += 1
    }
    var stopHits = 0L
    i = 0
    while (i < stopSeen.length) { if (stopSeen(i)) stopHits += 1; i += 1 }
    var nHash = 0L; var nEll = 0L
    i = 0
    while (i < str.length) {
      if (str.charAt(i) == '#') nHash += 1
      if (i + 2 < str.length && str.charAt(i) == '.' &&
          str.charAt(i + 1) == '.' && str.charAt(i + 2) == '.') {
        nEll += 1; i += 3
      } else i += 1
    }
    var nLines = 1L; var nBullet = 0L; var nEllLine = 0L
    var lineStart = 0
    var p = 0
    def lineFlags(a: Int, b: Int): Unit = {
      if (b - a >= 2 && (str.charAt(a) == '-' || str.charAt(a) == '*') &&
          str.charAt(a + 1) == ' ') nBullet += 1
      if (b - a >= 3 && str.charAt(b - 1) == '.' && str.charAt(b - 2) == '.' &&
          str.charAt(b - 3) == '.') nEllLine += 1
    }
    while (p < str.length) {
      if (str.charAt(p) == '\n') {
        lineFlags(lineStart, p)
        nLines += 1
        lineStart = p + 1
      }
      p += 1
    }
    lineFlags(lineStart, str.length)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, sumLen, nAlpha, nHash, nEll,
        nLines, nBullet, nEllLine, stopHits))
  }
}

/** Distinct word-n-shingle hex60 hashes in one codegen'd pass —
  * value-identical to
  * `transform(array_distinct(wordShingles(text, n)), s => hex60(s))`
  * but ~10x faster: the Column-algebra form runs four nested
  * interpreted higher-order functions per row (CodegenFallback), this
  * is one tight JVM loop (asserted equal in specs).
  */
/** Word n-gram strings as a native codegen'd expression — the
  * string-valued sibling of [[ShingleHex60]] (multiset, no dedup). */
case class WordShingleStrings(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.wordShingleStrings(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.wordShingleStrings($str, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All Gopher-rule raw counts in one codegen'd linear pass — see
  * [[TextHashUtil.gopherStats]]. The Column-algebra formulation it
  * replaces ran SIX interpreted higher-order-function scans per
  * document (aggregate/transform/filter with a regex per token —
  * all CodegenFallback); this is one tight JVM loop inside
  * whole-stage codegen, and the quality-filter family
  * (gopher filter, ensemble, calibration) sits on the corpus hot
  * path at 100 TB. */
case class GopherTextStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      "n_words", "sum_word_len", "n_alpha_words", "n_hash", "n_ellipsis",
      "n_lines", "n_bullet_lines", "n_ellipsis_lines", "stop_hits")
      .map(f => org.apache.spark.sql.types.StructField(
        f, org.apache.spark.sql.types.LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.gopherStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.gopherStats($str);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Summed stopword-occurrence count for one language's word list as a
  * native codegen'd expression — see [[TextHashUtil.langHits]]. */
case class LangHits(child: Expression, words: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  private lazy val wordsArr: Array[String] = words.toArray

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.langHits(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      wordsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langWords", wordsArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.langHits($str, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Language-ID argmax as a native codegen'd expression — see
  * [[TextHashUtil.langIdArgmax]]. */
case class LangIdArgmax(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.langIdArgmax(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.langIdArgmax($str);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Non-overlapping word chunks as a native codegen'd expression —
  * see [[TextHashUtil.wordChunks]]. */
case class WordChunks(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.wordChunks(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.wordChunks($str, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Overlapping (strided) word chunks as a native codegen'd
  * expression — see [[TextHashUtil.wordChunksStrided]]. */
case class WordChunksStrided(child: Expression, n: Int, stride: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.wordChunksStrided(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.wordChunksStrided($str, $n, $stride);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ShingleHex60(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] = Seq(StringType)


  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHex60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.TextHashUtil.shingleHex60($str, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge
  /** Column wrapper for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  /** Column wrapper for [[IntDotProduct]] (inputs: array<long>). */
  def intDotNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  /** Column wrapper for [[SimHash64]] (input: array<long> of token
    * hashes). */
  def simhash64(tokenHashes: Column): Column =
    GraftColumnBridge.column(SimHash64(
      GraftColumnBridge.expression(tokenHashes)))
  /** Column wrapper for [[RollingMinHash]]. */
  def rollingMinHash(text: Column, window: Int, base: Long,
                     modulus: Long): Column =
    GraftColumnBridge.column(RollingMinHash(
      GraftColumnBridge.expression(text), window, base, modulus))
  /** Column wrapper for [[ShingleHex60]]. */
  def shingleHex60(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHex60(
      GraftColumnBridge.expression(text), n))
  /** Column wrapper for [[WordShingleStrings]]. */
  def wordShingleStrings(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingleStrings(
      GraftColumnBridge.expression(text), n))
  /** Column wrapper for [[GopherTextStats]]. */
  def gopherStats(text: Column): Column =
    GraftColumnBridge.column(GopherTextStats(
      GraftColumnBridge.expression(text)))
  /** Column wrapper for [[LangHits]]. */
  def langHits(text: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(LangHits(
      GraftColumnBridge.expression(text), words))
  /** Column wrapper for [[LangIdArgmax]]. */
  def langIdArgmax(text: Column): Column =
    GraftColumnBridge.column(LangIdArgmax(
      GraftColumnBridge.expression(text)))
  /** Column wrapper for [[WordChunks]]. */
  def wordChunks(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordChunks(
      GraftColumnBridge.expression(text), n))
  /** Column wrapper for [[WordChunksStrided]]. */
  def wordChunksStrided(text: Column, n: Int, stride: Int): Column =
    GraftColumnBridge.column(WordChunksStrided(
      GraftColumnBridge.expression(text), n, stride))
}
