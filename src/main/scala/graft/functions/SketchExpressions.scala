package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash-sketch hot paths (MinHash
  * signatures, SimHash fingerprints).
  *
  * The pure-built-in formulations in [[TextFunctions]] are correct but run
  * k·|tokens| interpreted lambda evaluations per row (Spark's higher-order
  * functions don't participate in whole-stage codegen). These expressions
  * compute the identical values in one tight JVM loop per row over the same
  * xxhash64 primitive Spark's `xxhash64` function uses, so sketching a
  * 100 TB corpus costs one scan with cheap per-row work instead of an
  * interpreter bottleneck. Kept bit-for-bit equal to the built-in versions —
  * pinned by SketchParitySpec.
  */
object SketchExpressions {

  /** Column API: MinHash signature (k minima), equal to
    * [[TextFunctions.minhashSignature]]. Null on empty/missing shingle sets.
    */
  def minhash(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSignatureExpr(GraftColumnBridge.expression(shingles), k))

  /** Column API: 64-bit SimHash, equal to [[TextFunctions.simhash64]]. */
  def simhash(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(tokens)))

  /** Column API: word k-shingles, equal to [[TextFunctions.wordShinglesBuiltin]]
    * (space-joined token windows; empty array below k tokens).
    */
  def wordShingles(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(WordShinglesExpr(GraftColumnBridge.expression(tokens), k))

  /** Column API: Gopher top-n-gram fraction over a token array, equal to
    * [[TextFunctions.topNgramFractionOfBuiltin]].
    */
  def topNgramFraction(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramRunFractionExpr(GraftColumnBridge.expression(tokens), n, top = true))

  /** Column API: Gopher duplicate-n-gram fraction over a token array, equal
    * to [[TextFunctions.dupNgramFractionOfBuiltin]].
    */
  def dupNgramFraction(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramRunFractionExpr(GraftColumnBridge.expression(tokens), n, top = false))

  /** Column API: the portable 60-bit md5 hash, equal to
    * [[PortableHash.hash60Builtin]]. */
  def hash60(s: Column): Column =
    GraftColumnBridge.column(Hash60Expr(GraftColumnBridge.expression(s)))

  /** Column API: count of a string array's elements that match `regex`,
    * equal to `size(filter(arr, _.rlike(regex)))`. */
  def countMatching(arr: Column, regex: String): Column =
    GraftColumnBridge.column(
      CountMatchingExpr(GraftColumnBridge.expression(arr), regex))

  /** Column API: the PORTABLE-family MinHash signature — k minima of the
    * rotate-xor permutations of [[Hash60Expr]] over a shingle array; null
    * on empty input. Equal to the relational explode → hash → groupBy-min
    * formulation (pinned in OperatorsSpec). */
  def minhashPortable(shingles: Column, k: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      PortableMinHashExpr(GraftColumnBridge.expression(shingles), k, seed))

  /** Column API: whitespace tokens, equal to
    * `regexp_extract_all(c, "\\S+", 0)` (pinned in FunctionsSpec). */
  def whitespaceTokens(c: Column): Column =
    GraftColumnBridge.column(
      WhitespaceTokensExpr(GraftColumnBridge.expression(c), newlineOnly = false))

  /** Column API: non-empty lines, equal to
    * `filter(split(c, "\n"), l => length(l) > 0)` (pinned in
    * FunctionsSpec) — the same byte scan with LF as the only separator. */
  def nonEmptyLines(c: Column): Column =
    GraftColumnBridge.column(
      WhitespaceTokensExpr(GraftColumnBridge.expression(c), newlineOnly = true))

  /** Column API: order-preserving first-occurrence filter, equal to
    * [[TextFunctions.firstOccurrencesOfBuiltin]] (pinned in FunctionsSpec)
    * — one hash-set pass instead of the built-in's O(n²) scan. */
  def firstOccurrences(arr: Column): Column =
    GraftColumnBridge.column(
      FirstOccurrencesExpr(GraftColumnBridge.expression(arr)))

  /** Column API: the PORTABLE-family 60-bit SimHash over a token array —
    * majority vote per bit of the tokens' [[Hash60Expr]] values; 0 for
    * empty/missing input. Equal to the relational explode → hash →
    * 60-bit-sum formulation (pinned in OperatorsSpec). */
  def simhashPortable(tokens: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      GraftColumnBridge.column(
        PortableSimHashExpr(GraftColumnBridge.expression(tokens))),
      org.apache.spark.sql.functions.lit(0L))
}

/** `regexp_extract_all(s, "\\S+", 0)` natively — the corpus tokenizer,
  * which every text query runs first, as one byte scan instead of a regex
  * engine pass. Equivalence is structural: Java's `\s` is exactly the six
  * ASCII bytes {space, \t, \n, \x0B, \f, \r}, and no byte of a multi-byte
  * UTF-8 character can equal an ASCII byte, so maximal runs of
  * non-whitespace BYTES are precisely the regex's maximal runs of
  * non-whitespace CHARACTERS (pinned against the regex form in
  * FunctionsSpec, incl. unicode whitespace lookalikes such as U+00A0,
  * which neither form treats as a separator). Token values are UTF8String
  * slices of the input — no per-match java.lang.String materialization.
  *
  * `newlineOnly = true` is the line splitter: the same scan with LF as
  * the only separator, equal to `filter(split(s, "\n"), length(_) > 0)`
  * (empty segments between consecutive LFs drop out of both forms).
  */
case class WhitespaceTokensExpr(child: Expression, newlineOnly: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (newlineOnly) "ws_lines" else "ws_tokens"

  private def isWs(b: Byte): Boolean =
    if (newlineOnly) b == 0x0A
    else b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out += org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokensExpr =
    copy(child = newChild)
}

/** The md5-family 60-bit SimHash in one pass per document — the portable
  * twin of [[SimHash64Expr]] and the native form of
  * [[graft.operators.Dedup.simhash60PortableRelational]]: for each token,
  * one digest; for each of the 60 bits, a vote; bit set when votes·2 >
  * token count. The relational form explodes tokens and runs 61
  * aggregates (count + 60 bit sums) through a shuffle just to re-group
  * row-local data. Parity niceties mirrored exactly: a null token element
  * counts toward the total (explode emits its row; count(1) counts it)
  * but votes for no bits (sum skips its null hash); an empty array
  * yields 0 through the wrapper's coalesce, as the relational left-join
  * back to the corpus does.
  */
case class PortableSimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue: java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // wrapper coalesces to 0 (left-join semantics)
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.get().digest(arr.getUTF8String(i).getBytes)
        var u = 0L
        var b = 0
        while (b < 8) { u = (u << 8) | (d(b) & 0xffL); b += 1 }
        val h = u >>> 4
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit).toLong * 2 > n.toLong) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimHashExpr =
    copy(child = newChild)
}

/** The md5-family MinHash signature in one pass per document — the
  * portable twin of [[MinHashSignatureExpr]]. The relational formulation
  * (explode shingles → hash60 → groupBy(doc).agg(k mins)) amplifies the
  * corpus by shingles-per-document and pays a full shuffle just to
  * re-group what was already row-local; this computes the same k minima
  * in a tight loop over the shingle array — one md5 per shingle, k
  * integer rotate-xor permutes per hash, zero exchange. Bit-equality
  * with the relational form (and so with the DuckDB replay, which keeps
  * the relational shape) is pinned in OperatorsSpec; empty arrays return
  * null and null elements are skipped, mirroring how the explode path
  * drops those rows before the aggregate.
  */
case class PortableMinHashExpr(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash60"

  @transient private lazy val consts: Array[(Int, Long)] =
    PortableHash.permConstants(k, seed).toArray

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue: java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val d = md.get().digest(arr.getUTF8String(i).getBytes)
        var u = 0L
        var b = 0
        while (b < 8) { u = (u << 8) | (d(b) & 0xffL); b += 1 }
        val h = u >>> 4 // == Hash60Expr: top 60 digest bits
        var j = 0
        while (j < k) {
          val (r, c) = consts(j)
          // rot60 then xor — same math as PortableHash.permute, in longs
          val p = (((h & ((1L << (60 - r)) - 1)) << r) | (h >>> (60 - r))) ^ c
          if (p < mins(j)) mins(j) = p
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashExpr =
    copy(child = newChild)
}

/** `size(filter(arr, _.rlike(regex)))` natively: the same java.util.regex
  * engine and `Matcher.find()` semantics RLike evaluates, minus the
  * per-element interpreted-lambda machinery (higher-order functions don't
  * participate in codegen, and the filter materializes the kept elements
  * just to count them). Null elements never match — rlike null-propagates
  * into the filter's not-kept branch — and a null array is null, matching
  * the built-in chain exactly (pinned in FunctionsSpec). The line/word
  * signal family (bullet lines, ellipsis lines, alpha words) rides on it.
  */
case class CountMatchingExpr(child: Expression, regex: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "count_matching"

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val total = arr.numElements()
    var n = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i) &&
        pattern.matcher(arr.getUTF8String(i).toString).find()) n += 1
      i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): CountMatchingExpr =
    copy(child = newChild)
}

/** The portable family's base hash, natively: the top 60 bits of the MD5
  * digest of the UTF-8 string. The built-in formulation
  * `conv(substring(md5(s), 1, 15), 16, 10)` computes the same value the
  * long way round — materialize a 32-char lowercase hex STRING of the
  * digest, slice it, parse it back digit-by-digit in base 16 — all pure
  * overhead around the digest itself; DuckDB still runs that formulation
  * (it IS the portability contract), Spark just reads the bits directly:
  * the first 15 hex chars are exactly the big-endian top 60 bits of the
  * digest's first 8 bytes. Bit-equality with the built-in chain is pinned
  * in FunctionsSpec; every md5-family operator (MinHash/CMS/HLL/
  * sampling/weighted draws) rides on it.
  */
case class Hash60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hash60"

  // one digest instance per thread, reused across rows (digest() resets)
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue: java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.getBytes
      case b: Array[Byte] => b
      case other => throw new IllegalStateException(
        s"hash60 expects a string/binary input, got ${other.getClass}")
    }
    val d = md.get().digest(bytes)
    var u = 0L
    var i = 0
    while (i < 8) { u = (u << 8) | (d(i) & 0xffL); i += 1 }
    u >>> 4 // drop the 16th hex digit: 60 bits, always non-negative
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

/** The shared kernel of Gopher's top-n-gram and duplicate-n-gram signals,
  * natively: build the document's word n-gram strings, sort them, scan the
  * runs of equal adjacent grams once, and return
  *   top = true  → max_run · n / n_tokens   (top-gram token coverage)
  *   top = false → grams-in-runs>1 / n_grams (duplicate-gram mass)
  * as a double; null when the document has fewer than n tokens (matching
  * the built-in formulations' ratio-null semantics bit-for-bit — the
  * division is the same int→double cast Divide the Column form evaluates).
  *
  * The built-in formulation (array_sort + an `aggregate` struct fold per
  * signal) is correct but interpreted — Spark's higher-order functions
  * don't participate in whole-stage codegen, and the fold allocates a
  * struct per gram. This is one tight JVM loop per row; q52 (three top-n
  * signals) and q58 (six dup-n signals) run on it.
  */
case class NgramRunFractionExpr(child: Expression, n: Int, top: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nTok = arr.numElements()
    val g = nTok - n + 1
    if (g <= 0) return null
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val sh = new Array[org.apache.spark.unsafe.types.UTF8String](g)
    var i = 0
    while (i < g) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      // concatWs skips null parts — same as the built-ins' concat_ws, so a
      // null token degrades identically in both formulations
      sh(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    // any total order groups equal grams adjacently, which is all the run
    // scan needs — natural UTF8String (binary) order, like array_sort
    java.util.Arrays.sort(sh.asInstanceOf[Array[Object]])
    var run = 1
    var best = 1
    var dup = 0
    i = 1
    while (i < g) {
      if (sh(i).equals(sh(i - 1))) run += 1
      else {
        if (run > 1) dup += run
        if (run > best) best = run
        run = 1
      }
      i += 1
    }
    if (run > 1) dup += run
    if (run > best) best = run
    java.lang.Double.valueOf(
      if (top) (best * n).toDouble / nTok.toDouble
      else dup.toDouble / g.toDouble)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word k-shingles of an array<string>: element i is tokens[i..i+k-1] joined
  * by a single space — the string-building stage of MinHash, natively.
  */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of an array<string>: element j is
  * min over shingles s of xxhash64(xxhash64(s), j) — the same double-hash
  * family as the built-in formulation (base string hash with seed 42, then
  * re-hash with the permutation index).
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    // per-shingle: base = xxhash64(s); r1 = xxhash64-step(base) is reused
    // across all k permutations (permutation j only adds the final int mix)
    val r1 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val base = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      r1(i) = XxHash64Function.hash(base, LongType, 42L)
      i += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      i = 0
      while (i < n) {
        val h = XxHash64Function.hash(j, IntegerType, r1(i))
        if (h < m) m = h
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string>: bit i of the result is set iff the
  * majority of token hashes have bit i set. Empty input → 0L.
  */
/** Order-preserving first-occurrence filter over an array<string> — the
  * within-document repetition-removal primitive, in ONE hash-set pass
  * (O(n) expected) where the built-in
  * `filter(ls, (x, i) => array_position(ls, x) === i + 1)` is O(n²)
  * comparisons per document and stalls an executor on a pathological
  * 100k-line boilerplate page. Semantics are pinned equal to the built-in
  * form in FunctionsSpec: first copy of each element kept in order, and
  * NULL elements dropped (array_position's null propagation makes the
  * built-in's predicate null, which filter treats as false).
  */
case class FirstOccurrencesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  // SQL-reachable (graft_first_occurrences): reject non-string arrays at
  // analysis time instead of ClassCastException inside an executor
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_first_occurrences expects array<string>, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(16, n * 2))
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (seen.add(s)) out.add(s)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2L > n.toLong) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
