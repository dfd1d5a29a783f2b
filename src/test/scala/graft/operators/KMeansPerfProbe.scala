package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual measurement harness for the flat-vs-two-level Lloyd cost model
  * (not part of the suite — timings are load-sensitive):
  *
  * {{{ sbt -batch "Test/runMain graft.operators.KMeansPerfProbe" }}}
  *
  * Times three clusterings of the same 102,400×64 corpus: flat k=24,
  * flat k=512, and two-level at derived k_total=512 (target=200). The
  * claim under test is [[KMeans.assignTwoLevel]]'s scaladoc: per-point
  * assignment cost ~2·√k·d, so two-level at k=512 should run within ~2×
  * of flat k=24 while flat k=512 pays the full ~21× distance-eval
  * multiple. Measured numbers are recorded in NEXT.md.
  */
object KMeansPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 102400L
    val d = 64
    // deterministic pseudo-random floats in [-1, 1) from xxhash64
    val vec = array((0 until d).map(j =>
      (pmod(xxhash64(col("id"), lit(j)), lit(2000000L)).cast("double")
        / 1000000.0 - 1.0).cast("float")): _*)
    val pts = spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
      .repartition(8)
    pts.cache().count()

    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $dt%8.2f s")
      dt
    }

    // END-TO-END Lloyd (includes the per-round d-column aggregate, which
    // is k-independent and dominates at moderate k)
    KMeans.assign(pts, "vec_id", "embedding", k = 8, iterations = 1)
      .write.mode("overwrite").format("noop").save() // warmup: JIT + codegen
    graft.Storage.releaseAll(spark)
    pts.cache().count()

    val iters = 3
    val tFlat24 = time("flat k=24") {
      KMeans.assign(pts, "vec_id", "embedding", k = 24, iterations = iters)
        .write.mode("overwrite").format("noop").save()
    }
    graft.Storage.releaseAll(spark); pts.cache().count()
    val tTwo512 = time("two-level k_total=512") {
      KMeans.assignTwoLevel(pts, "vec_id", "embedding",
        targetClusterSize = 200L, iterations = iters)
        .write.mode("overwrite").format("noop").save()
    }
    graft.Storage.releaseAll(spark); pts.cache().count()
    val tFlat512 = time("flat k=512") {
      KMeans.assign(pts, "vec_id", "embedding", k = 512, iterations = iters)
        .write.mode("overwrite").format("noop").save()
    }
    println(f"end-to-end two-level(512)/flat(24): ${tTwo512 / tFlat24}%.2f " +
      f"(flat(512)/flat(24): ${tFlat512 / tFlat24}%.2f)")

    // ASSIGNMENT-ONLY map passes — the term that scales with k. A
    // two-level assignment costs one k₁-block pass plus one ~√k-block
    // group pass; flat costs one k-block pass.
    val scaled = pts.select(col("vec_id"),
      transform(col("embedding"), x =>
        floor(x.cast("double") * 1000000.0).cast("long")).as("__x"))
    scaled.cache().count()
    def matK(k: Int): Array[Array[Long]] =
      Array.tabulate(k)(i => Array.tabulate(d)(j => ((i * d + j) % 1999) * 1000L - 999000L))
    def scanFlat(k: Int): Double = {
      val b = spark.sparkContext.broadcast(matK(k))
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        scaled.select(KMeans.nearestCentroidBcast(col("__x"), b).as("cid"))
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      b.destroy()
      println(f"assign-only flat k=$k%-5d $t%8.2f s")
      t
    }
    def scanGrouped(groups: Int, perGroup: Int): Double = {
      val cents = (0 until groups).map(g => g -> matK(perGroup)).toMap
      val b = spark.sparkContext.broadcast(cents)
      val withG = scaled.withColumn("__g",
        pmod(col("vec_id"), lit(groups.toLong)).cast("int"))
      val cid = org.apache.spark.sql.GraftColumnBridge.column(
        NearestCentroidGroupExpr(
          org.apache.spark.sql.GraftColumnBridge.expression(col("__g")),
          org.apache.spark.sql.GraftColumnBridge.expression(col("__x")), b))
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        withG.select(cid.as("cid")).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      b.destroy()
      println(f"assign-only grouped ${groups}x$perGroup $t%8.2f s")
      t
    }
    scanFlat(24) // scan-cost floor warms the path
    val f24 = scanFlat(24)
    val f512 = scanFlat(512)
    val f4096 = scanFlat(4096)
    // two-level at k_total=512: coarse pass (23 centroids) + fine pass
    // (23 groups × ~23 centroids)
    val two512 = scanFlat(23) + scanGrouped(23, 23)
    // k_total=4096: 64 + 64×64
    val two4096 = scanFlat(64) + scanGrouped(64, 64)
    println(f"assign-only two-level(512)/flat(24): ${two512 / f24}%.2f " +
      f"[flat(512)/flat(24): ${f512 / f24}%.2f]")
    println(f"assign-only two-level(4096)/flat(24): ${two4096 / f24}%.2f " +
      f"[flat(4096)/flat(24): ${f4096 / f24}%.2f]")
    spark.stop()
  }
}
