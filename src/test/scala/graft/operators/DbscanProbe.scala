package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Parameter probe for the DBSCAN gate (run with
  * `Test/runMain graft.operators.DbscanProbe [sfDir...]`): pick (eps,
  * minPts, targetClusterSize) where the gate BITES — nonzero core,
  * border, AND noise points at every gate SF (the q208 lesson: a gate
  * whose filter never fires proves nothing), and more than one cluster
  * so the component closure is exercised.
  *
  * Method: the planned operator semantics inline — q94 Lloyd cells via
  * [[KMeans.assignAuto]], within-cell round-6 cosines ≥ eps as the
  * ε-neighbor relation, core = ≥ minPts neighbors — swept over a small
  * (eps, minPts) grid at each SF, printing
  * (core, border, noise, clusters).
  *
  * MEASURED (2026-08-16, targetClusterSize = 250 so the CELL BOUND is
  * live at gate scale — 2 cells at sf0.001/sf0.01, 8 at sf0.1):
  *
  *   sf0.001: eps=0.35/minPts=2 → core 83,  border 77,  noise 340, 15 clusters
  *   sf0.01:  eps=0.35/minPts=2 → core 79,  border 90,  noise 331, 18 clusters
  *   sf0.1:   eps=0.35/minPts=2 → core 731, border 476, noise 793, 48 clusters
  *
  * eps=0.25 floods (≤ 2 noise points anywhere, 2 giant components);
  * eps=0.30 merges everything into 2-3 clusters (no real structure);
  * eps=0.35/minPts ≥ 3 starves core at the small SFs (18-23 cores, and
  * minPts=4 leaves ZERO clusters at sf0.001). eps=0.35/minPts=2 is the
  * one grid point with all three point types 2-digit-populated AND a
  * 15-48-cluster structure at every SF — ADOPTED for q236. The
  * noise-majority regime is also the realistic curation posture (most
  * of a random-ish corpus is background, the dense islands are the
  * planted near-dup neighborhoods).
  */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                        "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val emb = Tables(spark, dir).embeddings
      val asg = KMeans.assignAuto(emb, "vec_id", "embedding",
        targetClusterSize = 250L, iterations = 5)
      val pts = emb.join(asg, "vec_id")
      val a = pts.select(col("cluster").as("__c"), col("vec_id").as("__ia"),
        col("embedding").as("__va"),
        VectorFunctions.normSq(col("embedding")).as("__na"))
      val b = pts.select(col("cluster").as("__c"), col("vec_id").as("__ib"),
        col("embedding").as("__vb"),
        VectorFunctions.normSq(col("embedding")).as("__nb"))
      val prAll = a.join(b, "__c").filter(col("__ia") =!= col("__ib"))
        .withColumn("cs", round(VectorFunctions.cosineFromNormSq(
          VectorFunctions.dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")), 6))
        .filter(col("cs").isNotNull)
        .select(col("__ia"), col("__ib"), col("cs"))
        .persist()
      val n = pts.count()
      for (eps <- Seq(0.25, 0.30, 0.35); minPts <- Seq(2, 3, 4)) {
        val pr = prAll.filter(col("cs") >= eps)
        val cnt = pr.groupBy(col("__ia")).count()
        val core = cnt.filter(col("count") >= minPts)
          .select(col("__ia").as("cid"))
        val coreEdges = pr.join(core, pr("__ia") === core("cid"))
          .drop("cid")
          .join(core.withColumnRenamed("cid", "cid2"),
            pr("__ib") === col("cid2"))
          .select(col("__ia").as("u"), col("__ib").as("v"))
        val comp = ConnectedComponents.components(coreEdges)
        val nCore = core.count()
        val borders = pr.join(core, pr("__ib") === core("cid"))
          .select(col("__ia")).distinct()
          .join(core.withColumnRenamed("cid", "__ia"), Seq("__ia"),
            "left_anti")
        val nBorder = borders.count()
        val nClusters = comp.select(col("component")).distinct().count()
        println(f"[dbscan-probe] $dir eps=$eps minPts=$minPts " +
          f"core=$nCore border=$nBorder noise=${n - nCore - nBorder} " +
          f"clusters=$nClusters")
      }
      prAll.unpersist()
      graft.Storage.releaseAll(spark)
    }
    spark.stop()
  }
}
