package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Manual measurement harness for the PPJoin POSITIONAL filter decision
  * (VERDICT_r10 directive #6; not part of the suite — timings are
  * load-sensitive):
  *
  * {{{ sbt -batch "Test/runMain graft.operators.SetSimPosProbe [sfDir] [tau]" }}}
  *
  * Replicates [[SetSimJoin]]'s cosine candidate generation twice over the
  * documents corpus — prefix filter only, and prefix + positional
  * (1 + min(na−i, nb−j) >= ⌈τ√(na·nb)⌉ at each collision) — and prints
  * collisions and post-dedup candidate pairs for both, plus wall-clock.
  * The filter is only worth its posexplode/wider-shuffle overhead where
  * candidates ≫ true pairs (q126's τ=0.99 regime is the test bed — the
  * q114 corpus is output-bound and gains nothing). Measured numbers are
  * recorded in NEXT.md.
  */
object SetSimPosProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = if (args.length > 1) args(1).toDouble else 0.99
    val t2 = tau * tau
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val docs = df.select(col("doc_id"), array_distinct(col("toks")).as("ts"))
      .withColumn("n", size(col("ts"))).filter(col("n") > 0)
    val tok = docs.select(col("doc_id"), col("n"), explode(col("ts")).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = tok.join(dfreq, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("o"))
      .withColumn("ots", transform(col("o"), s => s.getField("tok")))
      .withColumn("p", greatest(
        col("n") - ceil(col("n") * lit(t2) - lit(1e-6)).cast("int") + 1, lit(1)))
      .select(col("doc_id"), col("n"), col("ots"), col("p")).cache()
    ordered.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val lenOk = col("na") >= col("nb") * lit(t2) - lit(1e-6) &&
      col("nb") >= col("na") * lit(t2) - lit(1e-6)

    val preOld = ordered.select(col("doc_id"), col("n"),
      explode(slice(col("ots"), lit(1), col("p"))).as("ptok"))
    val candOld = preOld.select(col("doc_id").as("doc_a"), col("n").as("na"), col("ptok"))
      .join(preOld.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b")).filter(lenOk)
    val (collOld, sCollOld) = timed(candOld.count())
    val (pairsOld, sPairsOld) = timed(
      candOld.select(col("doc_a"), col("doc_b")).distinct().count())

    val preNew = ordered.select(col("doc_id"), col("n"),
      posexplode(slice(col("ots"), lit(1), col("p"))).as(Seq("i0", "ptok")))
    val candNew = preNew
      .select(col("doc_id").as("doc_a"), col("n").as("na"), col("i0").as("ia"), col("ptok"))
      .join(preNew.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("i0").as("ib"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b")).filter(lenOk)
      .filter(lit(1) + least(col("na") - (col("ia") + 1), col("nb") - (col("ib") + 1)) >=
        ceil(sqrt((col("na") * col("nb")).cast("double")) * lit(tau) - lit(1e-6)).cast("int"))
    val (collNew, sCollNew) = timed(candNew.count())
    val (pairsNew, sPairsNew) = timed(
      candNew.select(col("doc_a"), col("doc_b")).distinct().count())

    println(f"tau=$tau sf=$sfDir")
    println(f"prefix-only:       collisions=$collOld%10d pairs=$pairsOld%10d  (${sCollOld + sPairsOld}%.2f s)")
    println(f"prefix+positional: collisions=$collNew%10d pairs=$pairsNew%10d  (${sCollNew + sPairsNew}%.2f s)")
    spark.stop()
  }
}
