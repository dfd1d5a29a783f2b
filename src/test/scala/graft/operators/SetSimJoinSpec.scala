package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered set-similarity join vs the quadratic ground truth: the
  * candidate rule must be lossless (blocked == brute force, including a
  * pair sitting EXACTLY on the τ boundary) and the float slack in the
  * prefix-length arithmetic must only ever over-cover.
  */
class SetSimJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // id 1 ⊃ id 2 with Jaccard exactly 18/20 = 0.9 (the τ boundary);
  // clusters of four sets sharing 15 of 16 tokens (pairwise 15/17 ≈ .88);
  // id 999 is empty and must never pair
  private lazy val corpus = {
    val a = (0 until 20).map(i => s"t$i")
    val b = (0 until 18).map(i => s"t$i")
    val clusters = (0 until 40).map { i =>
      (100 + i, (0 until 15).map(k => s"w${(i / 4) * 100 + k}") :+ s"x$i")
    }
    (Seq((1, a), (2, b), (999, Seq.empty[String])) ++ clusters).toDF("id", "toks")
  }

  private def brute(tau: Double) = {
    val d = corpus.select(col("id"), array_distinct(col("toks")).as("ts"))
      .filter(size(col("ts")) > 0)
    val l = d.select(col("id").as("doc_a"), col("ts").as("ta"))
    val r = d.select(col("id").as("doc_b"), col("ts").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb")))
    l.crossJoin(r).filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        inter.cast("double") / (size(col("ta")) + size(col("tb")) - inter))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
  }

  private def blocked(tau: Double) =
    SetSimJoin.joinSelf(corpus, "id", "toks", tau)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet

  test("τ=0.9: blocked join equals brute force, including the exact-boundary pair") {
    val exact = brute(0.9)
    assert(exact.contains((1, 2, 0.9)), "18/20 must qualify at τ=0.9 (boundary inclusion)")
    assert(blocked(0.9) == exact)
  }

  test("τ=0.85: cluster pairs (15/17) join; blocked equals brute force") {
    val exact = brute(0.85)
    assert(exact.size > brute(0.9).size, "lowering τ must admit the cluster pairs")
    assert(blocked(0.85) == exact)
  }

  test("τ=0.5 dense regime: blocked equals brute force") {
    assert(blocked(0.5) == brute(0.5))
  }

  test("empty token sets never pair") {
    assert(blocked(0.5).forall { case (a, b, _) => a != 999 && b != 999 })
  }

  test("prefix length arithmetic: ⌊n(1−τ)⌋+1 with over-cover-only slack") {
    val d = corpus.filter(col("id") === 1).select(
      array_distinct(col("toks")).as("ts"))
    // n=20, τ=0.9 → p = ⌊2.0…⌋+1; fl(20·0.1) may land a hair above 2, the
    // slack must still give 3 (never 2·=under-cover, never 4=waste)
    val p = d.select((floor(size(col("ts")) * lit(1.0 - 0.9) + lit(1e-6)) + 1)
      .cast("int")).head().getInt(0)
    assert(p == 3)
  }

  // ---- the other measures: each blocked variant vs its own quadratic
  // ground truth, thresholds placed to include an exact-boundary pair ----

  private def bruteBy(simOf: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column, keep: Double) = {
    val d = corpus.select(col("id"), array_distinct(col("toks")).as("ts"))
      .filter(size(col("ts")) > 0)
    val l = d.select(col("id").as("doc_a"), col("ts").as("ta"))
    val r = d.select(col("id").as("doc_b"), col("ts").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb")))
    l.crossJoin(r).filter(col("doc_a") < col("doc_b"))
      .withColumn("sim", simOf(inter, size(col("ta")), size(col("tb"))))
      .filter(col("sim") >= keep)
      .select("doc_a", "doc_b", "sim")
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
  }

  test("cosine: blocked equals brute force at the 18/√360 boundary and below") {
    val cos = (c: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
               nb: org.apache.spark.sql.Column) =>
      c.cast("double") / sqrt((na * nb).cast("double"))
    val boundary = 18.0 / math.sqrt(360.0) // ids 1,2: 18 shared of 20×18
    for (tau <- Seq(boundary, 0.85, 0.5)) {
      val exact = bruteBy(cos, tau)
      val got = SetSimJoin.joinSelfCosine(corpus, "id", "toks", tau)
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
      assert(got == exact, s"tau=$tau")
      if (tau == boundary)
        assert(exact.contains((1, 2, boundary)), "exact-boundary pair must qualify")
    }
  }

  test("dice: blocked equals brute force incl. the 36/38 boundary") {
    val dice = (c: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
                nb: org.apache.spark.sql.Column) =>
      (c * 2).cast("double") / (na + nb)
    val boundary = 36.0 / 38.0
    for (tau <- Seq(boundary, 0.8)) {
      val exact = bruteBy(dice, tau)
      val got = SetSimJoin.joinSelfDice(corpus, "id", "toks", tau)
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
      assert(got == exact, s"tau=$tau")
    }
  }

  test("overlap: blocked equals brute force at the exact t boundary") {
    def brute(t: Int) = {
      val d = corpus.select(col("id"), array_distinct(col("toks")).as("ts"))
        .filter(size(col("ts")) > 0)
      val l = d.select(col("id").as("doc_a"), col("ts").as("ta"))
      val r = d.select(col("id").as("doc_b"), col("ts").as("tb"))
      val inter = size(array_intersect(col("ta"), col("tb")))
      l.crossJoin(r).filter(col("doc_a") < col("doc_b"))
        .withColumn("overlap", inter.cast("long")).filter(col("overlap") >= t)
        .select("doc_a", "doc_b", "overlap")
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSet
    }
    for (t <- Seq(18, 15, 2)) { // 18 = exact shared count of ids 1,2
      val got = SetSimJoin.joinSelfOverlap(corpus, "id", "toks", t)
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSet
      assert(got == brute(t), s"t=$t")
    }
    assert(SetSimJoin.joinSelfOverlap(corpus, "id", "toks", 18)
      .collect().exists(r => r.getInt(0) == 1 && r.getInt(1) == 2))
  }

  test("containment: blocked equals brute force; the measure is asymmetric") {
    def bruteC(tau: Double) = {
      val d = corpus.select(col("id"), array_distinct(col("toks")).as("ts"))
        .filter(size(col("ts")) > 0)
      val l = d.select(col("id").as("doc_a"), col("ts").as("ta"))
      val r = d.select(col("id").as("doc_b"), col("ts").as("tb"))
      val inter = size(array_intersect(col("ta"), col("tb")))
      l.crossJoin(r).filter(col("doc_a") =!= col("doc_b"))
        .withColumn("containment", inter.cast("double") / size(col("ta")))
        .filter(col("containment") >= tau)
        .select("doc_a", "doc_b", "containment")
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
    }
    for (tau <- Seq(1.0, 0.9, 0.85)) {
      val got = SetSimJoin.joinSelfContainment(corpus, "id", "toks", tau)
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
      assert(got == bruteC(tau), s"tau=$tau")
    }
    // id 2 (18 tokens) ⊂ id 1 (20 tokens): containment(2→1) = 1.0 but
    // containment(1→2) = 0.9 — only one direction survives τ = 1.0
    val at1 = SetSimJoin.joinSelfContainment(corpus, "id", "toks", 1.0)
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(at1.contains((2, 1)) && !at1.contains((1, 2)))
  }

  private lazy val weightTable = {
    // rare tokens heavy, shared filler light
    val heavy = (0 until 30).map(i => (s"r$i", 100L))
    val light = (0 until 30).map(i => (s"c$i", 1L))
    (heavy ++ light).toDF("tok", "w")
  }

  private def bruteWeighted(docs: org.apache.spark.sql.DataFrame,
                            tau: Double): Set[(Int, Int, Double)] = {
    val wmap = weightTable.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = docs.select(col("id"), array_distinct(col("toks")))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      sh = (ta & tb).toSeq.map(t => wmap.getOrElse(t, 1L)).sum
      un = (ta | tb).toSeq.map(t => wmap.getOrElse(t, 1L)).sum
      wj = sh.toDouble / un if wj >= tau
    } yield (a, b, wj)).toSet
  }

  test("weighted jaccard: blocked equals brute force; rarity weights flip decisions") {
    // pair (10, 11): share 2 rare of 3 rare + differ on 2 common →
    // unweighted 2/5 = 0.4; weighted (200)/(302) ≈ 0.662
    // pair (20, 21): share 2 common, differ on 1 rare each →
    // unweighted 2/4 = 0.5; weighted 2/202 ≈ 0.0099
    val docs = Seq(
      (10, Seq("r0", "r1", "c0")), (11, Seq("r0", "r1", "c1")),
      (20, Seq("c2", "c3", "r5")), (21, Seq("c2", "c3", "r6")),
      (30, Seq("r7", "r8", "r9")), (31, Seq("r7", "r8", "r9")), // identical
      (99, Seq.empty[String])).toDF("id", "toks")
    for (tau <- Seq(0.6, 0.5, 0.05)) {
      val got = SetSimJoin.joinSelfWeighted(docs, "id", "toks", weightTable, tau)
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
      assert(got == bruteWeighted(docs, tau), s"tau=$tau")
    }
    val at06 = SetSimJoin.joinSelfWeighted(docs, "id", "toks", weightTable, 0.6)
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(at06.contains((10, 11)) && !at06.contains((20, 21)),
      "rare-token overlap must qualify where common-token overlap does not")
  }

  test("weighted jaccard: exact-boundary pair and unseen-token default weight") {
    // shared weight 100+1=101, union 101+100=201... craft an EXACT boundary:
    // share r0 (100), differ c0 vs c1 (1 each): wj = 100/102
    val docs = Seq(
      (1, Seq("r0", "c0")), (2, Seq("r0", "c1")),
      (3, Seq("zz_unseen", "r1")), (4, Seq("zz_unseen", "r1"))).toDF("id", "toks")
    val tau = 100.0 / 102.0
    val got = SetSimJoin.joinSelfWeighted(docs, "id", "toks", weightTable, tau)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
    assert(got == bruteWeighted(docs, tau))
    assert(got.map(t => (t._1, t._2)) == Set((1, 2), (3, 4)),
      "boundary pair must qualify; unseen tokens weigh defaultW = 1")
  }

  test("weighted containment: blocked equals brute force; rare phrases dominate boilerplate") {
    def bruteWc(subj: org.apache.spark.sql.DataFrame,
                cont: org.apache.spark.sql.DataFrame,
                tau: Double): Set[(Int, Int, Double)] = {
      val wmap = weightTable.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select(col("id"), array_distinct(col("toks")))
          .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSet)
          .filter(_._2.nonEmpty)
      (for {
        (a, ta) <- rows(subj); (b, tb) <- rows(cont) if a != b
        sh = (ta & tb).toSeq.map(t => wmap.getOrElse(t, 1L)).sum
        wa = ta.toSeq.map(t => wmap.getOrElse(t, 1L)).sum
        c = sh.toDouble / wa if c >= tau
      } yield (a, b, c)).toSet
    }
    // subject 40: its rare token r0 (w=100) is inside 41; the common c9
    // is not → weighted containment 100/101 ≈ 0.990 though only 1 of 2
    // TOKENS is shared (unweighted 0.5). Subject 50: its common tokens
    // are inside 51 but its rare r3 is not → 2/102 ≈ 0.0196: boilerplate
    // overlap cannot reach τ without the rare phrase.
    val subj = Seq(
      (40, Seq("r0", "c9")), (50, Seq("c4", "c5", "r3"))).toDF("id", "toks")
    val cont = Seq(
      (41, Seq("r0", "c0", "c1")), (51, Seq("c4", "c5", "r6")),
      (60, Seq("r0", "c9", "zz")), // superset of 40 → containment 1.0
      (99, Seq.empty[String])).toDF("id", "toks")
    for (tau <- Seq(0.9, 0.5, 0.05)) {
      val got = SetSimJoin.joinContainmentWeighted(
          subj, cont, "id", "toks", weightTable, tau)
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
      assert(got == bruteWc(subj, cont, tau), s"tau=$tau")
    }
    val at09 = SetSimJoin.joinContainmentWeighted(
        subj, cont, "id", "toks", weightTable, 0.9)
      .collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(at09.contains((40, 41)) && at09.contains((40, 60)) &&
      !at09.exists(_._1 == 50),
      "rare-phrase inclusion must qualify; boilerplate-only must not")
    // asymmetry: 40 ⊆ 60 exactly (containment 1.0), but 60 as SUBJECT
    // against 40 leaves its zz token outside — 101/102 ≈ 0.9902, so the
    // direction flips the decision at τ = 0.995
    val flipped = SetSimJoin.joinContainmentWeighted(
        cont.filter(col("id") === 60), subj, "id", "toks", weightTable, 0.995)
      .collect()
    assert(flipped.isEmpty, "containment must stay directed")
  }

  test("watchlist containment equals the self join restricted to the subjects") {
    val subjects = corpus.filter(col("id") % 4 === 0)
    val got = SetSimJoin.joinContainment(subjects, corpus, "id", "toks", 0.85)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
    val expect = SetSimJoin.joinSelfContainment(corpus, "id", "toks", 0.85)
      .filter(col("doc_a") % 4 === 0)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "the subject subset must produce pairs at this tau")
    // subject tokens the containers never saw must not break the order or
    // the verify: a fresh subject strictly inside a corpus set still pairs
    val fresh = Seq((7777, Seq("t0", "t1", "t2", "zz_unseen"))).toDF("id", "toks")
    val out = SetSimJoin.joinContainment(fresh, corpus, "id", "toks", 0.75)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2)))
    // 3 of 4 tokens inside ids 1 and 2 → containment 0.75 to both
    assert(out.map(t => (t._1, t._2)).toSet == Set((7777, 1), (7777, 2)), out.toSeq)
    assert(out.forall(_._3 == 0.75))
  }
}
