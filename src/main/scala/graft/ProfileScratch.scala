package graft
import org.apache.spark.sql.SparkSession
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables(spark, "/root/testdata/sf0.1").embeddings
    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Seq(8, 20, 50).foreach { k =>
      timeIt(s"kmeans k=$k") {
        operators.KMeans.assign(emb, "vec_id", "embedding", k = k, iterations = 5)
          .write.mode("overwrite").format("noop").save()
      }
      Storage.releaseAll(spark)
    }
    spark.stop()
  }
}
