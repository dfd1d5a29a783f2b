package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the retrieval-side diversity pass: given each query's top-N candidate
  * list, greedily emit the result that maximizes
  * λ·rel(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s), so near-duplicate
  * hits stop crowding the head of the list. The standard second stage
  * after ANN retrieval in RAG-style serving and in curation review
  * queues.
  *
  * Determinism contract: rel and candidate-pair sims are round-6 cosines
  * (the q29 guard), the MMR score is two IEEE double ops on those
  * already-identical values (λ·rel − (1−λ)·maxsim, same literal λ both
  * engines), and every argmax breaks ties on candidate id — so the DuckDB
  * oracle replays all nSel rounds bit-exactly with no tolerance.
  *
  * Plan shape: ONE broadcast relevance pass (queries × corpus, queries
  * are budget-bounded), a per-query top-nCand window cut, ONE candidate
  * pairwise-sim join bounded by queries·nCand² (nCand is a serving knob,
  * 10s–100s — never corpus-sized), then nSel greedy rounds that each
  * join the PERSISTED sim frame against the tiny selected set. Driver
  * traffic is queries·nSel rows total — the result itself.
  */
object Mmr {

  /** Re-rank each query's top-`nCand` cosine candidates into `nSel` MMR
    * positions.
    *
    * @param corpus  (idCol, vecCol) rows; a corpus row whose id equals
    *                the query id is excluded from that query's
    *                candidates (self-match guard for shared id spaces)
    * @param queries (qidCol, qvecCol) rows — the serving budget; bounded
    * @param lambda  relevance weight in [0, 1]
    * @return (query_id, mmr_rank 1..nSel, idCol, rel, score) — rel is
    *         the round-6 cosine to the query; score is the MMR objective
    *         at selection time (round 1 has no selected set: score =
    *         λ·rel)
    */
  def rerank(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             nCand: Int, nSel: Int, lambda: Double): DataFrame = {
    require(nCand >= nSel && nSel >= 1, "need nCand >= nSel >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = corpus.sparkSession

    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"),
      VectorFunctions.normSq(col(qvecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
      VectorFunctions.normSq(col(vecCol)).as("__cn"))

    val wCand = Window.partitionBy(col("__qid"))
      .orderBy(col("rel").desc, col("__cid").asc)
    val cand = c.join(broadcast(q), col("__cid") =!= col("__qid"))
      .withColumn("rel", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("__qv"), col("__cv")),
        col("__qn"), col("__cn")), 6))
      .filter(col("rel").isNotNull)
      .withColumn("__rn", row_number().over(wCand))
      .filter(col("__rn") <= nCand)
      .select(col("__qid"), col("__cid"), col("__cv"), col("__cn"), col("rel"))
      .persist()

    val a = cand.select(col("__qid"), col("__cid").as("__ca"),
      col("__cv").as("__va"), col("__cn").as("__na"))
    val b = cand.select(col("__qid"), col("__cid").as("__cb"),
      col("__cv").as("__vb"), col("__cn").as("__nb"))
    val sims = a.join(b, "__qid")
      .filter(col("__ca") =!= col("__cb"))
      .withColumn("sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("__va"), col("__vb")),
        col("__na"), col("__nb")), 6))
      .select(col("__qid"), col("__ca"), col("__cb"), col("sim"))
      .persist()

    val wPick = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__cid").asc)
    def rank1(scored: DataFrame): Array[Row] = scored
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("__qid"), col("__cid"), col("rel"), col("score"))
      .collect()

    // Round 1: nothing selected, the objective is λ·rel alone.
    var picked = rank1(cand.withColumn("score", lit(lambda) * col("rel")))
      .map(r => (1, r)).toVector

    val qidField = queries.select(col(qidCol)).schema.fields(0)
    val cidField = corpus.select(col(idCol)).schema.fields(0)
    def selDf(rows: Seq[Row]): DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r.get(0), r.get(1))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        qidField.copy(name = "__sq"), cidField.copy(name = "__sc"))))

    var r = 2
    while (r <= nSel) {
      // maxsim per still-unselected candidate: join the persisted sim
      // frame against the tiny selected set (collected rows — bounded by
      // queries·nSel), then one max aggregate.
      val sel = selDf(picked.map(_._2))
      val maxsim = sims
        .join(broadcast(sel),
          col("__qid") === col("__sq") && col("__cb") === col("__sc"))
        .groupBy(col("__qid"), col("__ca")).agg(max(col("sim")).as("maxsim"))
        .select(col("__qid").as("__mq"), col("__ca"), col("maxsim"))
      val unselected = cand.join(broadcast(sel),
        col("__qid") === col("__sq") && col("__cid") === col("__sc"),
        "left_anti")
      val scored = unselected
        .join(maxsim, col("__qid") === col("__mq") &&
          col("__cid") === col("__ca"))
        .drop("__mq", "__ca")
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("maxsim"))
      picked = picked ++ rank1(scored).map(row => (r, row))
      r += 1
    }
    cand.unpersist()
    sims.unpersist()

    spark.createDataFrame(
      spark.sparkContext.parallelize(
        picked.map { case (rk, row) =>
          Row(row.get(0), rk.toLong, row.get(1), row.get(2), row.get(3))
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        qidField.copy(name = "query_id"),
        org.apache.spark.sql.types.StructField("mmr_rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        cidField.copy(name = idCol),
        org.apache.spark.sql.types.StructField("rel",
          org.apache.spark.sql.types.DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }
}
