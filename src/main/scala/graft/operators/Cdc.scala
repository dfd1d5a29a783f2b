package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking — the Rabin-fingerprint boundary rule of
  * storage dedup (Muthitacharoen et al. 2001, LBFS; the rsync/restic
  * family): cut a document where a rolling hash of the trailing w
  * characters hits 0 mod D, so chunk boundaries follow CONTENT, not
  * offsets. Insert one character near the top of a document and
  * fixed-size blocks all shift — every block changes; content-defined
  * chunks re-synchronize at the next boundary, so identical passages in
  * different documents (or different revisions) produce IDENTICAL
  * chunks wherever they sit. That is the shift-robust complement of
  * [[Dedup]]'s whole-doc and [[SubstringDedup]]'s n-gram views.
  *
  * Determinism/replay contract: the window hash is the plain polynomial
  * h(i) = Σ_{j=0..w−1} code(s[i+j])·B^{w−1−j} mod M over exact longs
  * (M prime < 2³¹, so every SQL-side product ≤ 65535·M ≪ 2⁶³ needs no
  * intermediate mod) — the Spark side computes the same value
  * incrementally in O(n) ([[CdcChunksExpr]]), the oracle recomputes it
  * positionally in O(n·w); both are the same residue. Boundary ⇔
  * h(i) mod D = 0 cuts after position i+w−1; the document tail is
  * always a final chunk. Code points are Unicode scalar values — on
  * ASCII/BMP text (this corpus) Spark's UTF-16 units and DuckDB's
  * `unicode()` agree; supplementary-plane text is outside the replay
  * contract (documented, not silently wrong: both sides still chunk
  * deterministically, they just disagree with each other).
  *
  * Scale shape: chunking is one codegen-stage scan (a per-row native
  * expression, no shuffle); the chunk inventory explodes to
  * (doc, idx, chunk) rows whose downstream dedup is a plain
  * map-side-combined count — the standard exact-dedup shape.
  */
object Cdc {

  val DefaultWindow = 16
  val DefaultBase = 31L
  val DefaultMod = 1000000007L
  val DefaultDivisor = 64L

  /** Chunk a text column: array<string> of content-defined chunks. */
  def chunks(text: Column, window: Int = DefaultWindow,
             base: Long = DefaultBase, mod: Long = DefaultMod,
             divisor: Long = DefaultDivisor): Column =
    org.apache.spark.sql.GraftColumnBridge.column(CdcChunksExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(text),
      window, base, mod, divisor))

  /** Per-document chunk inventory: (doc_id, chunk_idx, chunk_len,
    * chunk_hash) — idx 1-based in document order, hash portable-60 so
    * cross-engine joins/dedup replay.
    */
  def inventory(docs: DataFrame, idCol: String, textCol: String,
                window: Int = DefaultWindow): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(chunks(col(textCol), window)).as(Seq("i0", "chunk")))
      .select(col("doc_id"), (col("i0") + 1).as("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        PortableHash.hash60(col("chunk")).as("chunk_hash"))

  /** Repeated-content report: chunks occurring more than once across
    * the corpus, with document reach — the storage-dedup payoff view.
    * Top `topK` by (occurrences desc, chunk) for a bounded result.
    */
  def repeatedChunks(docs: DataFrame, idCol: String, textCol: String,
                     window: Int = DefaultWindow, topK: Int = 100): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(chunks(col(textCol), window)).as("chunk"))
      .groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .orderBy(col("n_occ").desc, col("chunk"))
      .limit(topK)
}

/** The O(n) incremental evaluation of the CDC boundary rule: maintain
  * h = Σ trailing-window codes · B^k mod M via
  * h ← (h − c_out·B^{w−1})·B + c_in (mod M, non-negative), cut after the
  * window end whenever h mod D = 0, always emit the tail. Null text →
  * null; text shorter than the window → one chunk (no window fits).
  */
case class CdcChunksExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    window: Int, base: Long, mod: Long, divisor: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(window >= 2 && base > 1 && mod > 1 && divisor > 1,
    "window >= 2, base/mod/divisor > 1")

  @transient private lazy val powTop: Long = { // B^{w-1} mod M
    var p = 1L
    var k = 0
    while (k < window - 1) { p = p * base % mod; k += 1 }
    p
  }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks expects string, got ${t.simpleString}")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val n = s.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int] // end index, exclusive
    if (n >= window) {
      var h = 0L
      var j = 0
      while (j < window) { h = (h * base + s.charAt(j)) % mod; j += 1 }
      var i = 0 // window start (0-based); windows at i = 0 .. n-window
      while (i <= n - window) {
        if (h % divisor == 0L) cuts += i + window
        if (i < n - window) {
          // products stay ≪ 2^63: char ≤ 65535, intermediate < 3·mod·base
          h = ((h - s.charAt(i) * powTop % mod + mod * 2) % mod * base +
            s.charAt(i + window)) % mod
        }
        i += 1
      }
    }
    buildChunks(s, cuts)
  }

  private def buildChunks(s: String,
      cuts: scala.collection.mutable.ArrayBuffer[Int]): Any = {
    if (cuts.isEmpty || cuts.last != s.length) cuts += s.length
    val out = new Array[AnyRef](cuts.length)
    var start = 0
    var k = 0
    while (k < cuts.length) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(
        s.substring(start, cuts(k)))
      start = cuts(k)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): CdcChunksExpr =
    copy(child = newChild)
}
