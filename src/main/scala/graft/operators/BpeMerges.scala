package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType, LongType, IntegerType}

/** Merge-rule learning over token sequences — the TOKENIZER-TRAINING
  * shape (BPE, Sennrich et al. 2016; word-level it is word2phrase,
  * Mikolov et al. 2013): R rounds of "count adjacent symbol pairs →
  * take the most frequent pair → fuse its occurrences greedily
  * left-to-right", growing a phrase/subword vocabulary from the corpus.
  * Nothing else in the suite TRAINS a tokenizer; q64/q65 consume one.
  *
  * Deterministic contract (every piece replays in SQL):
  *   - counting sees ALL adjacent positions (i, i+1) of the current
  *     state — the standard BPE count;
  *   - the chosen pair maximizes count, ties to the lexicographically
  *     smallest (left, right) — `ORDER BY c DESC, a, b LIMIT 1`;
  *   - application is GREEDY LEFT-TO-RIGHT and non-overlapping: in a
  *     run of overlapping matches (only possible when left = right),
  *     the 1st, 3rd, … survive — the oracle replays this with islands
  *     arithmetic (keep match positions at even offset from their
  *     run's start);
  *   - the fused symbol is left ⊕ ' ' ⊕ right, so later rounds can
  *     fuse it further into longer phrases.
  *
  * Scale shape: each round is ONE scan of the state (pair explosion →
  * map-side-combined count) plus one driver-side argmax of a
  * vocabulary-sized frame — never a shuffle of the sequences
  * themselves; the merge applies as a native per-row expression
  * ([[BpeMergeExpr]]). The state is REBASED onto a cached RDD leaf per
  * round (the [[KMeans.fit]] discipline) so lineage and plan size stay
  * O(1) in rounds. Driver state is one (pair, count) row per round.
  */
object BpeMerges {

  /** One learned rule: the round's winning pair and its count. */
  final case class Rule(round: Int, left: String, right: String, count: Long)

  /** Learn `numMerges` rules and return (final state, rules). The state
    * frame is (idCol, syms array<string>) after all merges applied.
    */
  def learn(docs: DataFrame, idCol: String, tokensCol: String,
            numMerges: Int): (DataFrame, Seq[Rule]) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    var st = docs.select(col(idCol).as("__id"), col(tokensCol).as("syms"))
    var prev: Option[org.apache.spark.rdd.RDD[Row]] = None
    val rules = Seq.newBuilder[Rule]

    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      // rebase: cached RDD leaf — applying round r's merge lazily on top
      // of round r-1's MATERIALIZED state, never re-deriving the chain
      val rdd = st.rdd
      rdd.cache()
      st = spark.createDataFrame(rdd, st.schema)

      val top = adjacentPairs(st).groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(rdd)

      if (top.isEmpty) exhausted = true // corpus fused to singletons
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += Rule(r, a, b, c)
        st = st.select(col("__id"),
          org.apache.spark.sql.GraftColumnBridge.column(BpeMergeExpr(
            org.apache.spark.sql.GraftColumnBridge.expression(col("syms")),
            a, b)).as("syms"))
        r += 1
      }
    }
    (st.select(col("__id").as(idCol), col("syms")), rules.result())
  }

  /** The learned rules as a frame: (round, left_sym, right_sym,
    * pair_count) — the gate shape (q131).
    */
  def merges(docs: DataFrame, idCol: String, tokensCol: String,
             numMerges: Int): DataFrame = {
    val (_, rules) = learn(docs, idCol, tokensCol, numMerges)
    rulesFrame(docs.sparkSession, rules)
  }

  /** An already-learned rule list as the [[merges]] gate frame — split out
    * so a caller holding memoized rules (SparkEntry shares ONE fit across
    * the q131/q132/q134 gates) materializes the identical shape without
    * re-training.
    */
  def rulesFrame(spark: org.apache.spark.sql.SparkSession,
                 rules: Seq[Rule]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rules.map(r =>
        Row(r.round, r.left, r.right, r.count)): _*),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))

  /** Symbol frequencies of the post-merge corpus, top `topK` by
    * (count desc, symbol) — exercises every apply round end-to-end
    * (q132's gate shape).
    */
  def finalSymbolCounts(docs: DataFrame, idCol: String, tokensCol: String,
                        numMerges: Int, topK: Int): DataFrame =
    symbolCounts(learn(docs, idCol, tokensCol, numMerges)._1, topK)

  /** Symbol frequencies of a post-merge state frame (`syms` column), top
    * `topK` by (count desc, symbol) — the counting tail of
    * [[finalSymbolCounts]], callable on an [[applyRules]] re-encode (the
    * two states are spec-pinned identical on the training corpus).
    */
  def symbolCounts(st: DataFrame, topK: Int): DataFrame =
    st.select(explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("sym"))
      .limit(topK)

  /** Apply an already-learned rule list in round order — the INFERENCE
    * twin of [[learn]]: encode new text with a trained vocabulary. The
    * rules chain as nested [[BpeMergeExpr]]s inside ONE projection, so
    * encoding is a single scan with no shuffle and no driver loop —
    * exactly what tokenizing a fresh 100 TB corpus against a frozen
    * vocabulary needs. Applying the rules [[learn]] produced on the
    * SAME corpus reproduces its final state (spec-pinned).
    */
  def applyRules(docs: DataFrame, idCol: String, tokensCol: String,
                 rules: Seq[Rule]): DataFrame = {
    val syms = rules.sortBy(_.round).foldLeft(col(tokensCol)) { (c, r) =>
      org.apache.spark.sql.GraftColumnBridge.column(BpeMergeExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(c), r.left, r.right))
    }
    docs.select(col(idCol), syms.as("syms"))
  }

  /** All adjacent (a, b) symbol pairs of the state — position i paired
    * with i+1, overlapping, the standard BPE count input.
    */
  private def adjacentPairs(st: DataFrame): DataFrame =
    st.select(explode(when(size(col("syms")) >= 2,
        transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
}

/** Greedy left-to-right non-overlapping fuse of one (left, right) pair
  * in a symbol array: scan once; at a match emit left⊕' '⊕right and
  * skip both, else copy the symbol. Null array → null; null ELEMENTS
  * pass through unfused (they match nothing) — checked via isNullAt
  * before any read (the UncoveredTokensExpr lesson).
  */
case class BpeMergeExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    left: String, right: String)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val l = org.apache.spark.unsafe.types.UTF8String.fromString(left)
  @transient private lazy val rr = org.apache.spark.unsafe.types.UTF8String.fromString(right)
  @transient private lazy val fused =
    org.apache.spark.unsafe.types.UTF8String.fromString(left + " " + right)

  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge expects array<string>, got ${t.simpleString}")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n)
    var i = 0
    while (i < n) {
      val matches = i + 1 < n && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
        arr.getUTF8String(i).equals(l) && arr.getUTF8String(i + 1).equals(rr)
      if (matches) { out += fused; i += 2 }
      else { out += (if (arr.isNullAt(i)) null else arr.getUTF8String(i)); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeMergeExpr =
    copy(child = newChild)
}
