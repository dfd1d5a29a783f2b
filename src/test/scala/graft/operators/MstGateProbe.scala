package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate-shaping probe for the MST family (run with
  * `Test/runMain graft.operators.MstGateProbe`): over the q234 mutual
  * k-NN pairs with w = 1000000 − round(cos·10⁶), report the pair count,
  * weight quantiles, fixpoint forest size, rounds-to-fixpoint, and the
  * cluster structure of the threshold cut at candidate wmax values —
  * the q238 threshold must SPLIT the forest (clusters at the cut ≠
  * components of the full forest), else the serve gate proves nothing
  * (the q208 empty-gate lesson).
  *
  * MEASURED (2026-08-16): the mutual graph is much denser than the
  * near-dup intuition suggests — at the small SFs every point shares ONE
  * Lloyd cell (derived k = 1), so k=5 mutual neighborhoods knit the whole
  * corpus together and the fixpoint forest is nearly SPANNING:
  *
  *   sf0.001: 953 pairs, w q10/50/90 = 611956/673983/706507; forest 497
  *     edges, ONE component. Cuts: wmax 620000 → 119 edges / 61 comps;
  *     650000 → 251 / 57; 680000 → 442 / 10.
  *   sf0.01:  921 pairs, forest 492, one component; 620000 → 110 / 72.
  *   sf0.1:   3800 pairs, forest 1983, TWO components; 620000 →
  *     1552 / 97; but 650000 already keeps 1943 edges / 2 comps — no
  *     bite at the larger SF.
  *
  * wmax = 620000 (cos ≥ 0.38) ADOPTED for q238: the one probed value
  * where the cut clusters sit strictly between the full components
  * (1-2) and singletons at EVERY gate SF (61/72/97 clusters).
  */
object MstGateProbe {
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
        targetClusterSize = 2500L, iterations = 5)
      val mp = KnnGraph.mutualPairs(
        KnnGraph.clusterLocalKnn(
          emb.join(asg, "vec_id"), "vec_id", "embedding", "cluster", k = 5),
        "vec_id")
      val we = mp.withColumn("w",
        lit(1000000L) - round(col("cos_sim") * 1e6).cast("long"))
        .select(col("id_a"), col("id_b"), col("w")).persist()
      val nPairs = we.count()
      val qs = we.stat.approxQuantile("w", Array(0.1, 0.5, 0.9), 0.0)
      val forest = Mst.boruvkaFixpoint(we, "id_a", "id_b", "w").persist()
      val nForest = forest.count()
      val fullComps = ConnectedComponents.components(
        forest.select(col("u"), col("v")))
        .select(col("component")).distinct().count()
      println(s"[mst-probe] $dir pairs=$nPairs w(q10/50/90)=${qs.mkString("/")} " +
        s"forest=$nForest fullComps=$fullComps")
      for (wmax <- Seq(620000L, 650000L, 680000L)) {
        val cut = forest.filter(col("w") <= wmax)
        val nCut = cut.count()
        val nComp = ConnectedComponents.components(
          cut.select(col("u"), col("v")))
          .select(col("component")).distinct().count()
        println(s"[mst-probe]   wmax=$wmax cutEdges=$nCut cutComps=$nComp")
      }
      we.unpersist(); forest.unpersist()
      graft.Storage.releaseAll(spark)
    }
    spark.stop()
  }
}
