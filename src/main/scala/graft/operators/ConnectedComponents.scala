package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the resolution
  * step that turns near-duplicate PAIRS into duplicate CLUSTERS: every
  * document in a component maps to one canonical id (the component's
  * minimum), which is what a dedup pipeline actually deletes against.
  * [[graft.ops.Closure]] covers functional (successor) graphs; this
  * covers the symmetric similarity graph.
  *
  * Algorithm: min-label propagation with POINTER JUMPING, to FIXPOINT —
  * each round every node takes the minimum of its own label and its
  * neighbors' labels, then shortcuts through its label's label (a label
  * is always a node id of the same component, so the jump is sound and
  * only accelerates); an accumulator counts changed labels so
  * convergence is detected on the same job that materializes the round.
  * The jump makes a length-d chain converge in O(log d) rounds rather
  * than O(d); `maxIter` guards pathological input.
  * Each round rebases onto a fresh cached-RDD leaf (the Closure
  * pattern — `localCheckpoint` carries child statistics and a join loop
  * squares them until planning hangs). The symmetric edge list is
  * likewise cached once. Caller releases storage after its action
  * ([[graft.Storage.releaseAll]] — the Verify/Bench contract).
  */
object ConnectedComponents {

  /** @param edges two-column frame (`u`, `v`) of undirected edges
    * @return (`node`, `component`) for every node incident to an edge,
    *         `component` = the minimum node id of its component
    */
  def components(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val sym0 = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val symRdd = sym0.rdd
    symRdd.cache()
    symRdd.count()
    val sym = spark.createDataFrame(symRdd, sym0.schema)
    val l0 = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var lRdd = l0.rdd
    lRdd.cache()
    lRdd.count()
    var labels = spark.createDataFrame(lRdd, l0.schema)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("v") === labels("node"))
        .groupBy(sym("u").as("nbr_node")).agg(min(col("label")).as("nbr_label"))
      val stepped = labels.join(nbrMin, labels("node") === col("nbr_node"), "left")
        .select(col("node"), col("label").as("l0"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("l1"))
      val jumpSrc = labels.select(col("node").as("j_node"), col("label").as("j_label"))
      val next = stepped.join(jumpSrc, stepped("l1") === col("j_node"), "left")
        .select(col("node"),
          least(col("l1"), coalesce(col("j_label"), col("l1"))).as("label"),
          (least(col("l1"), coalesce(col("j_label"), col("l1"))) < col("l0")).as("changed"))
      // Accumulator updated inside a TRANSFORMATION: task retries or
      // speculative execution can over-count changed labels. That is
      // benign here by direction — over-counting only schedules an extra
      // (idempotent) round; it can never report 0 while labels are still
      // moving, because a task that observed a change contributes ≥ 1 on
      // every (re)run and an unchanged round adds nothing on any run.
      val acc = spark.sparkContext.longAccumulator("cc-changed")
      val rdd = next.rdd.map { r => if (r.getBoolean(2)) acc.add(1L); r }
      rdd.cache()
      rdd.count()
      changed = acc.value > 0
      lRdd.unpersist(blocking = false)
      lRdd = rdd
      labels = spark.createDataFrame(rdd, next.schema).drop("changed")
      iter += 1
    }
    require(!changed,
      s"ConnectedComponents: not converged after $maxIter rounds")
    labels.select(col("node"), col("label").as("component"))
  }
}
