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

    val policies: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      // the gate's deterministic draw: lowest part ids
      "low_id" -> li.filter(col("l_partkey") < 3)
        .select(concat(lit("p"), col("l_partkey").cast("string")).as("node"))
        .distinct(),
      // highest-degree nodes (distinct-neighbor degree)
      "top_degree" -> edges.distinct()
        .groupBy(col("src")).agg(countDistinct(col("dst")).as("deg"))
        .orderBy(col("deg").desc, col("src")).limit(3)
        .select(col("src").as("node")))

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
