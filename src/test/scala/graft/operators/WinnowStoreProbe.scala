package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual measurement harness for the q202 winnow-store cost breakdown
  * (not part of the suite — timings are load-sensitive):
  * {{{ sbt -batch "Test/runMain graft.operators.WinnowStoreProbe [sfDir]" }}}
  * Times each stage of the gate separately: the char-gram fingerprint
  * selection, the fp-bucketed store write, and the stored match probe.
  */
object WinnowStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[winnowprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fps = Winnowing.fingerprintsChars(docs, "doc_id", "text")
    val n = timed("fingerprint count (selection only)")(fps.count())
    println(s"[winnowprobe] fingerprint rows: $n")
    spark.sql("DROP TABLE IF EXISTS graft_winnow_probe")
    timed("buildStore (drop + bucketed write)")(
      Winnowing.buildStore(docs, "doc_id", "text", "graft_winnow_probe",
        buckets = 8))
    val m = timed("matchesStored count")(
      Winnowing.matchesStored(spark, "graft_winnow_probe").count())
    println(s"[winnowprobe] match pairs: $m")
    // the self-join's input: distinct (doc_id, fp) and the heavy-fp tail
    val u = spark.table("graft_winnow_probe")
      .select(col("doc_id"), col("fp")).distinct()
    println(s"[winnowprobe] distinct (doc,fp): ${u.count()}")
    u.groupBy(col("fp")).agg(count(lit(1)).as("g"))
      .orderBy(col("g").desc).limit(5).collect()
      .foreach(r => println(s"[winnowprobe] heavy fp group: ${r.getLong(1)}"))
    spark.sql("DROP TABLE IF EXISTS graft_winnow_probe")
    spark.stop()
  }
}
