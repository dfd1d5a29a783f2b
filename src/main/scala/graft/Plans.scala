package graft
import org.apache.spark.sql.SparkSession

/** Plan-dump tool for the optimization rounds: writes
  * `.explain("formatted")` output for the named queries to
  * `<outDir>/<query>_<tag>.txt` — the committed evidence (plans/r17/…)
  * the judge reads instead of running Spark. Driver-side tooling only.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <tag> <q1,q2,...>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    wanted.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plans] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
            println(s"[plans] wrote $outDir/${name}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plans] $name failed: $e")
          }
          Storage.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
