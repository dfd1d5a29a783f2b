package graft.operators

import graft.{Storage, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the landmark-SELECTION policy question left in
  * the round-15 backlog (run with
  * `Test/runMain graft.operators.LandmarkPolicyProbe`): do degree-top
  * landmarks tighten q225's distance estimates over the deterministic
  * low-id draw the gate uses?
  *
  * Method: on the sf0.01 part↔supplier graph, compute TRUE 4-hop-capped
  * distances for the q225 query grid (one [[Bfs.hopDistances]] run per
  * grid source — exact, not estimated), then for each policy build the
  * L = 3 landmark table at the same round cap and score
  * est(a,b) − true(a,b) over grid pairs where both are defined.
  *
  * MEASURED NEGATIVE (2026-08-15, sf0.01, grid = 10 parts × 10
  * suppliers, L = 3, rounds = 4): degree-top landmarks are WORSE than
  * the gate's deterministic low-id draw on this corpus — low_id:
  * coverage 100/100, exact 60, mean err 0.860, max 4; top_degree:
  * coverage 100/100, exact 50, mean err 1.240, max 4. The hubs sit so
  * central that nearly every est routes through the same place,
  * inflating detours; the low-id parts are ordinary nodes whose
  * distances differentiate. Consequence: the degree policy is a dead
  * lever here — q224/q225 keep the deterministic draw, and no policy
  * sibling gate is warranted on this corpus. Estimates are upper
  * bounds by construction (est ≥ true always; both tables share the
  * round cap, so est could also MISS pairs whose true path avoids all
  * landmarks — coverage is reported alongside tightness, and both
  * policies covered the full grid).
  *
  * SECOND MEASUREMENT (2026-08-16, same grid): the far-apart GREEDY
  * draw (k-center over hop distance — start at p0, repeatedly add the
  * node with max min-distance to the selected set) is a statistical
  * TIE with the low-id draw: coverage 100/100, exact 59 (vs 60), mean
  * err 0.880 (vs 0.860), max 4. The greedy walk picked p0, s0, p1 —
  * this bipartite part↔supplier graph is so dense (diameter ~4) that
  * "far apart" cannot differentiate landmarks, and the draw costs one
  * landmarkDistances pass per pick. Both alternatives probed and
  * rejected: the deterministic low-id draw stands for q224/q225, now
  * by measurement against BOTH standard policies.
  */
object LandmarkPolicyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val li = Tables(spark, dir).lineitem
    val pairs = li.select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val ua = li.filter(col("l_partkey") < 10)
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("n"))
      .distinct().as[String].collect().sorted
    val vb = li.filter(col("l_suppkey") < 10)
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("n"))
      .distinct()

    // TRUE capped distances: one exact multi-round BFS per grid source
    val truth: Map[(String, String), Long] = ua.flatMap { a =>
      val d = Bfs.hopDistances(edges, "src", "dst", Seq(a).toDF("node"),
          rounds = 4)
        .join(vb, col("node") === col("n"))
        .select(col("node"), col("dist"))
        .as[(String, Long)].collect()
      Storage.releaseAll(spark)
      d.map { case (b, dist) => (a, b) -> dist }
    }.toMap
    println(s"[lmprobe] true grid pairs defined: ${truth.size}")

    // far-apart greedy draw (k-center over hop distance): start at the
    // gate's lowest-id landmark, then repeatedly add the node FARTHEST
    // (min over selected, unreached-within-cap counts as farthest) from
    // the current set — one landmarkDistances pass per pick.
    val farApart: Seq[String] = {
      var lms = Vector("p0")
      val allNodes = edges.select(col("src").as("node")).distinct()
      while (lms.size < 3) {
        val minD = Bfs.landmarkDistances(edges, "src", "dst",
            lms.toDF("node"), rounds = 4)
          .groupBy(col("node")).agg(min(col("dist")).as("d"))
        val pick = allNodes.join(minD, Seq("node"), "left")
          .withColumn("d", coalesce(col("d"), lit(Long.MaxValue)))
          .filter(!col("node").isin(lms: _*))
          .orderBy(col("d").desc, col("node").asc).limit(1)
          .select(col("node")).as[String].collect()(0)
        Storage.releaseAll(spark)
        lms :+= pick
      }
      println(s"[lmprobe] far_apart draw: ${lms.mkString(", ")}")
      lms
    }

    val policies: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      // the gate's deterministic draw: lowest part ids
      "low_id" -> li.filter(col("l_partkey") < 3)
        .select(concat(lit("p"), col("l_partkey").cast("string")).as("node"))
        .distinct(),
      // highest-degree nodes (distinct-neighbor degree)
      "top_degree" -> edges.distinct()
        .groupBy(col("src")).agg(countDistinct(col("dst")).as("deg"))
        .orderBy(col("deg").desc, col("src")).limit(3)
        .select(col("src").as("node")),
      // greedy far-apart draw (computed above)
      "far_apart" -> farApart.toDF("node"))

    for ((name, lms) <- policies) {
      val t0 = System.nanoTime()
      val ld = Bfs.landmarkDistances(edges, "src", "dst", lms, rounds = 4)
      val est = Bfs.landmarkEstimates(ld, ua.toSeq.toDF("n"), vb)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      Storage.releaseAll(spark)
      val both = truth.keySet.intersect(est.keySet).toSeq
      val errs = both.map(k => est(k) - truth(k))
      val exact = errs.count(_ == 0L)
      println(f"[lmprobe] $name: est_pairs=${est.size} true_pairs=${truth.size} " +
        f"covered=${both.size} exact=$exact mean_err=${
          if (errs.isEmpty) -1d else errs.sum.toDouble / errs.size}%.3f " +
        f"max_err=${if (errs.isEmpty) -1L else errs.max} " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
