package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

/** Batch perceptron — distributed training of a linear document filter
  * in EXACT INTEGER arithmetic (Rosenblatt 1958; the batch form sums
  * all misclassified updates per round, so the update is a pure
  * commutative integer sum — order-, partitioning- and merge-tree-free,
  * unlike the sequential perceptron whose result depends on row order).
  * The LLM-pipeline reading: quality filters à la CCNet / the GPT-3
  * data work are linear classifiers over cheap text features; this is
  * the TRAINING step for such a filter, done inside the engine, with
  * the same determinism contract as [[KMeans]] (integer features,
  * exact long dots, no floats anywhere) so the DuckDB oracle replays
  * every training round bit-exactly.
  *
  * Contract: features are an `array<long>` column (put the bias as a
  * constant-1 feature), labels are ±1, weights start at zero, and round
  * r computes w_r = w_{r-1} + Σ_{label·(w_{r-1}·x) <= 0} label·x — note
  * the <= : a zero margin (including every point in round 1) counts as
  * misclassified, which is what makes round 1 well-defined from w = 0.
  *
  * Scale shape: each round is ONE scan — the margin is a d-term exact
  * long dot against the round's weight literals (d = feature count,
  * small by design), the update is d map-side-combined sums over the
  * misclassified rows, and only d longs cross to the driver per round.
  * The feature frame is cached once; rounds do not grow lineage (only
  * the weight literals change — the [[KMeans.fit]] shape).
  */
object Perceptron {

  /** Train `rounds` batch-perceptron rounds; returns the weight vector
    * after every round, flattened to (round, idx, weight) rows — the
    * oracle-friendly shape.
    */
  def trainHistory(data: DataFrame, featuresCol: String, labelCol: String,
                   dim: Int, rounds: Int): DataFrame = {
    val spark = data.sparkSession
    val hist = trainWeights(data, featuresCol, labelCol, dim, rounds)
    val rows = for ((w, r) <- hist.zipWithIndex; j <- 0 until dim)
      yield Row(r + 1, j, w(j))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("idx", IntegerType, nullable = false),
        StructField("weight", LongType, nullable = false))))
  }

  /** The raw per-round weight vectors (index r = after round r+1). */
  def trainWeights(data: DataFrame, featuresCol: String, labelCol: String,
                   dim: Int, rounds: Int): Seq[Array[Long]] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = data.sparkSession
    val base0 = data.select(col(featuresCol).as("x"),
      col(labelCol).cast("long").as("y"))
    val rdd = base0.rdd
    rdd.cache()
    val base = spark.createDataFrame(rdd, base0.schema)

    var w = Array.fill(dim)(0L)
    val hist = Seq.newBuilder[Array[Long]]
    var r = 0
    while (r < rounds) {
      val margin = (0 until dim).map(j =>
        lit(w(j)) * element_at(col("x"), j + 1)).reduce(_ + _)
      val upd = base.filter(col("y") * margin <= 0)
        .select((0 until dim).map(j =>
          sum(col("y") * element_at(col("x"), j + 1)).as(s"u$j")): _*)
        .collect()
      w = w.clone()
      if (upd.nonEmpty && !upd(0).isNullAt(0)) { // null sums = no rows left
        var j = 0
        while (j < dim) { w(j) += upd(0).getLong(j); j += 1 }
      }
      hist += w
      r += 1
    }
    rdd.unpersist(blocking = false)
    hist.result()
  }

  /** Score a corpus against a trained weight vector: the exact long
    * margin and its sign — the quality-filter INFERENCE pass, one scan,
    * fully codegen'd.
    */
  def score(data: DataFrame, idCol: String, featuresCol: String,
            w: Array[Long]): DataFrame = {
    val margin = w.indices.map(j =>
      lit(w(j)) * element_at(col(featuresCol), j + 1)).reduce(_ + _)
    data.select(col(idCol), margin.as("margin"))
      .withColumn("predicted", when(col("margin") > 0, 1).otherwise(-1))
  }
}
