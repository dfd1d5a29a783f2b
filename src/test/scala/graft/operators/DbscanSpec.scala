package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class DbscanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { // array-order fold, the engine's dot contract
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) None else Some(d / nn)
  }

  /** Textbook DBSCAN over the within-cell ε-relation, deterministic
    * tiebreaks as documented on the operator (min component id; border
    * takes min adjacent core label).
    */
  private def brute(points: Seq[(Long, Int, Seq[Float])], eps: Double,
                    minPts: Int): Set[(Long, String, Option[Long])] = {
    val nbrs: Map[Long, Set[Long]] = points.map { case (id, c, v) =>
      id -> points.filter { p =>
        p._2 == c && p._1 != id &&
          cos(v, p._3).exists(s => round6(s) >= eps)
      }.map(_._1).toSet
    }.toMap
    val core = nbrs.filter(_._2.size >= minPts).keySet
    // components over core-core edges by repeated relabel to fixpoint
    var label = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbrs(c) if core(n)) {
        val m = math.min(label(c), label(n))
        if (label(c) != m) { label += c -> m; changed = true }
        if (label(n) != m) { label += n -> m; changed = true }
      }
    }
    points.map { case (id, _, _) =>
      if (core(id)) (id, "core", Some(label(id)))
      else {
        val adj = nbrs(id).filter(core)
        if (adj.nonEmpty) (id, "border", Some(adj.map(label).min))
        else (id, "noise", None)
      }
    }.toSet
  }

  private def run(points: Seq[(Long, Int, Seq[Float])], eps: Double,
                  minPts: Int,
                  parts: Int = 4): Set[(Long, String, Option[Long])] = {
    val df = points.toDF("vec_id", "cluster", "embedding").repartition(parts)
    Dbscan.clusterCells(df, "vec_id", "embedding", "cluster", eps, minPts)
      .as[(Long, String, Option[Long])].collect().toSet
  }

  // 2-D direction helpers: unit-ish vectors at an angle
  private def dir(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("hand case: two dense islands, a fringe, and background noise") {
    // eps=0.9 ⇒ neighbors within ~25.8°. minPts=2:
    // 1,2,3 mutually within 20° → all core, one cluster labeled 1.
    // 4 at 40° sees only 3 (20°; 2 is 30° away, cos≈0.866 < 0.9) →
    // 1 neighbor → border of cluster 1. 5 at 90° sees nobody → noise.
    // 6,7,8 around 180° → second cluster labeled 6.
    val pts = Seq(
      (1L, 0, dir(0)), (2L, 0, dir(10)), (3L, 0, dir(20)),
      (4L, 0, dir(40)), (5L, 0, dir(90)),
      (6L, 0, dir(180)), (7L, 0, dir(190)), (8L, 0, dir(170)))
    val got = run(pts, eps = 0.9, minPts = 2)
    assert(got == Set(
      (1L, "core", Some(1L)), (2L, "core", Some(1L)), (3L, "core", Some(1L)),
      (4L, "border", Some(1L)), (5L, "noise", None),
      (6L, "core", Some(6L)), (7L, "core", Some(6L)), (8L, "core", Some(6L))))
  }

  test("border adjacent to two clusters takes the MINIMUM core label") {
    // 20,21 core (cluster 20); 30,31 core (cluster 30); 25 sits between,
    // adjacent to one core of each but with only 2 neighbors < minPts=3.
    val pts = Seq(
      (20L, 0, dir(0)), (21L, 0, dir(5)), (22L, 0, dir(10)),
      (25L, 0, dir(22)),
      (30L, 0, dir(34)), (31L, 0, dir(39)), (32L, 0, dir(44)))
    // eps = 0.974 ⇒ neighbors within ~13.1°. At minPts=3 the core set is
    // exactly {22, 30} (each sees 3 points; everyone else sees 2), two
    // UNCONNECTED cores labeled by themselves. 25 is adjacent to both →
    // border with the MINIMUM adjacent label, min(22, 30) = 22.
    val got = run(pts, eps = 0.974, minPts = 3)
    assert(got.collect { case (25L, t, l) => (t, l) } ==
      Set(("border", Some(22L))))
    assert(got.collect { case (id, "core", _) => id } == Set(22L, 30L))
  }

  test("identical vectors in DIFFERENT cells are not neighbors") {
    val v = dir(0)
    val pts = Seq((1L, 0, v), (2L, 0, v), (3L, 0, v), (4L, 1, v))
    val got = run(pts, eps = 0.99, minPts = 2)
    assert(got.collect { case (4L, t, l) => (t, l) } == Set(("noise", None)))
    assert(got.collect { case (1L, t, _) => t } == Set("core"))
  }

  test("minPts counts OTHER points: a pair is not core at minPts=2") {
    val got = run(Seq((1L, 0, dir(0)), (2L, 0, dir(1))), eps = 0.9,
      minPts = 2)
    assert(got.forall(_._2 == "noise"))
    val got1 = run(Seq((1L, 0, dir(0)), (2L, 0, dir(1))), eps = 0.9,
      minPts = 1)
    assert(got1 == Set((1L, "core", Some(1L)), (2L, "core", Some(1L))))
  }

  test("zero-norm vector is noise and is nobody's neighbor") {
    val pts = Seq(
      (1L, 0, dir(0)), (2L, 0, dir(2)), (3L, 0, dir(4)),
      (9L, 0, Seq(0f, 0f)))
    val got = run(pts, eps = 0.9, minPts = 2)
    assert(got.collect { case (9L, t, l) => (t, l) } == Set(("noise", None)))
    assert(got.collect { case (1L, t, _) => t } == Set("core"))
  }

  test("matches brute force on random points across cells and partitionings") {
    val rnd = new Random(43)
    val pts = (0L until 150L).map(i =>
      (i, rnd.nextInt(3), Seq.fill(6)(rnd.nextFloat() - 0.5f)))
    val want = brute(pts, eps = 0.5, minPts = 3)
    assert(run(pts, eps = 0.5, minPts = 3, parts = 1) == want)
    assert(run(pts, eps = 0.5, minPts = 3, parts = 13) == want)
  }
}
