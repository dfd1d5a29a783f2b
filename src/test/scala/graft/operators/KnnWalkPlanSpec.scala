package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Plan pins for the graph-walk serve path (the IvfStoreSpec
  * discipline): the per-hop probes must carry the driver-held frontier
  * into the scans as pushed literal In filters, so an id-sorted store
  * answers each hop from matching row groups instead of a full pass —
  * the round-15 verdict's one weak flag.
  */
class KnnWalkPlanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scansOf)
  }

  private def pushedFilters(df: org.apache.spark.sql.DataFrame,
                            table: String): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    val scans = scansOf(df.queryExecution.executedPlan)
    val scan = scans.find(_.tableIdentifier.exists(_.table == table))
    assert(scan.isDefined, s"no FileSourceScanExec over $table")
    scan.get.metadata.getOrElse("PushedFilters", "")
  }

  test("edge and corpus probes push the frontier as literal In filters") {
    val rnd = new Random(83)
    val pts = (0L until 60L).map(i =>
      (i, Seq.fill(4)(rnd.nextFloat() - 0.5f)))
    val edges = pts.flatMap(p => (1 to 3).map(j =>
      (p._1, (p._1 + j) % 60L)))
    dropTable("graft_walkpin_graph")
    dropTable("graft_walkpin_corpus")
    // the store contract: sorted by the source id so row-group min/max
    // stats make the pushed In filter a point read
    edges.toDF("vec_id", "neighbor_id")
      .repartitionByRange(2, col("vec_id")).sortWithinPartitions("vec_id")
      .write.format("parquet").saveAsTable("graft_walkpin_graph")
    pts.toDF("vec_id", "embedding")
      .repartitionByRange(2, col("vec_id")).sortWithinPartitions("vec_id")
      .write.format("parquet").saveAsTable("graft_walkpin_corpus")

    val g = spark.table("graft_walkpin_graph")
      .select(col("vec_id").as("__gsrc"), col("neighbor_id").as("__gdst"))
    val ep = KnnGraph.edgeProbe(g, "__gsrc", Seq(3L, 17L, 41L))
    val epf = pushedFilters(ep, "graft_walkpin_graph")
    assert(epf.contains("In(vec_id"), s"edge probe not pushed: $epf")

    val c = spark.table("graft_walkpin_corpus")
      .select(col("vec_id").as("__cid"), col("embedding").as("__cv"))
    val cp = KnnGraph.corpusProbe(c, "__cid", Seq(3L, 4L, 18L),
      literalProbeMax = 4096)
    val cpf = pushedFilters(cp, "graft_walkpin_corpus")
    assert(cpf.contains("In(vec_id"), s"corpus probe not pushed: $cpf")

    // above the literal cap the probe falls back to the unpruned scan
    val wide = KnnGraph.corpusProbe(c, "__cid", Seq(1L, 2L, 3L),
      literalProbeMax = 2)
    assert(wide eq c)
    dropTable("graft_walkpin_graph")
    dropTable("graft_walkpin_corpus")
  }

  test("table-backed walk equals frame-backed walk (pruning is plan-only)") {
    val rnd = new Random(89)
    val pts = (0L until 50L).map(i =>
      (i, Seq.fill(4)(rnd.nextFloat() - 0.5f)))
    val edges = pts.flatMap(p => (1 to 3).map(j =>
      (p._1, (p._1 * 7 + j * 11) % 50L)).filter(_._2 != p._1))
    dropTable("graft_walkpin_g2")
    dropTable("graft_walkpin_c2")
    edges.toDF("vec_id", "neighbor_id")
      .repartitionByRange(2, col("vec_id")).sortWithinPartitions("vec_id")
      .write.format("parquet").saveAsTable("graft_walkpin_g2")
    pts.toDF("vec_id", "embedding")
      .repartitionByRange(2, col("vec_id")).sortWithinPartitions("vec_id")
      .write.format("parquet").saveAsTable("graft_walkpin_c2")
    val q = Seq((0L, pts(23)._2), (1L, pts(44)._2)).toDF("query_id", "qv")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    val fromTables = key(KnnGraph.greedySearch(
      spark.table("graft_walkpin_g2"), spark.table("graft_walkpin_c2"),
      "vec_id", "embedding", q, "query_id", "qv", hops = 3))
    val fromFrames = key(KnnGraph.greedySearch(
      edges.toDF("vec_id", "neighbor_id"), pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", q, "query_id", "qv", hops = 3))
    assert(fromTables == fromFrames)

    // and with the literal cap forced to 0, the fallback path (no
    // pushdown, join-side filtering) still answers identically
    val fallback = key(KnnGraph.greedySearch(
      spark.table("graft_walkpin_g2"), spark.table("graft_walkpin_c2"),
      "vec_id", "embedding", q, "query_id", "qv", hops = 3,
      literalProbeMax = 0))
    assert(fallback == fromTables)
    dropTable("graft_walkpin_g2")
    dropTable("graft_walkpin_c2")
  }
}
