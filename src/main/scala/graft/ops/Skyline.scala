package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D Pareto front (skyline) — the maxima of a point set under
  * coordinate-wise dominance (Börzsönyi et al. 2001, "The Skyline
  * Operator"): a point survives iff no other point is >= in both
  * coordinates and > in one. The data-selection primitive: "documents
  * not dominated on (length, lexical diversity)" picks the quality
  * frontier without committing to a weighting between the axes.
  *
  * The classic formulation is a quadratic NOT EXISTS self-join; in 2-D
  * it collapses to a SORT + RUNNING MAX: reduce to one candidate per
  * distinct x (the max-y — anything below is dominated within its own
  * column), order by x DESCENDING, and a candidate is on the front iff
  * its y exceeds every y seen so far (all of which have strictly
  * greater... >= x; the within-x max reduction settles the tie case).
  * The running max is [[PrefixSum.runningMax]]'s two-phase
  * decomposition — range partition + per-partition seeds — so no
  * single-task window ever sees the data; equal-max ties collapse to
  * the highest-x achiever by one more tiny aggregate.
  *
  * All-integer, so the front replays exactly.
  */
object Skyline {

  /** @return the Pareto-MAXIMAL points of (`xCol`, `yCol`) as
    *         (x, y, n_rows) — n_rows = how many input rows sit exactly
    *         on that front point.
    */
  def paretoFront2D(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val pts = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_rows"))
    // one candidate per x: the within-column max y
    val perX = pts.groupBy(col("x")).agg(max(col("y")).as("y"))
    // inclusive running max of y over x DESC; a candidate whose y equals
    // the running max is the max-so-far — and of the rows sharing one
    // max value, only the FIRST achiever (highest x) is undominated
    val withM = PrefixSum.runningMax(perX, Nil, Seq(col("x").desc),
      col("y"), out = "__m")
    val sky = withM.filter(col("y") === col("__m"))
      .groupBy(col("__m")).agg(max(col("x")).as("x"))
      .select(col("x"), col("__m").as("y"))
    sky.join(pts, Seq("x", "y")).select(col("x"), col("y"), col("n_rows"))
  }

  /** k-dimensional Pareto-MAXIMAL points (d >= 2) — the general-d
    * skyline the 2-D sort + running-max trick cannot express. The
    * distributed decomposition is Börzsönyi's divide-and-conquer
    * identity: skyline(S) = skyline(⋃ᵢ skyline(partᵢ)) — a per-partition
    * local pass, then one merge pass over the UNION OF LOCAL FRONTS
    * (front-sized, not data-sized).
    *
    * The local pass is APPEND-ONLY by construction: points arrive in
    * EXACT coordinate-sum DESCENDING order (a long sum under ANSI —
    * overflow throws rather than mis-sorting; coords must fit
    * Σ|cᵢ| < 2⁶³), and dominance implies a strictly larger exact sum,
    * so a later point can never dominate a buffered one and a sum-tie
    * between distinct points can never be a dominance pair — each
    * arrival needs only the "is it dominated?" probe against the
    * buffer, never the reverse sweep. Buffer size = the partition's
    * front size; the merge task sees Σ local fronts. THE CONTRACT:
    * front sizes must stay task-manageable — true of correlated and
    * independent dimensions (fronts grow ~(ln n)^(d−1)); a deliberately
    * anti-correlated corpus degenerates every skyline algorithm to
    * output-bound and this one to a big merge task.
    *
    * All-integer: the front replays exactly against the quadratic
    * NOT-EXISTS definition (which stays in the oracle, never here).
    * Returns (`c0`..`c{d-1}`, `n_rows`), n_rows = input rows exactly on
    * that front point.
    */
  def paretoFrontKD(df: DataFrame, coords: Seq[Column]): DataFrame = {
    require(coords.length >= 2, s"need >= 2 dimensions, got ${coords.length}")
    frontOfPts(aggregatePts(df, coords), coords.length)
  }

  /** (`c0`..`c{d-1}`, n_rows): the distinct-point reduction every
    * skyline variant starts from.
    */
  private def aggregatePts(df: DataFrame, coords: Seq[Column]): DataFrame = {
    val d = coords.length
    val named = coords.zipWithIndex.map { case (c, i) => c.cast("long").as(s"c$i") }
    df.select(named: _*)
      .filter((0 until d).map(i => col(s"c$i").isNotNull).reduce(_ && _))
      .groupBy((0 until d).map(i => col(s"c$i")): _*)
      .agg(count(lit(1)).as("n_rows"))
  }

  private def dominatesArr(d: Int)(a: Array[Long], b: Array[Long]): Boolean = {
    var ge = true; var gt = false; var i = 0
    while (i < d && ge) {
      if (a(i) < b(i)) ge = false else if (a(i) > b(i)) gt = true
      i += 1
    }
    ge && gt
  }

  /** The two-pass local-fronts-then-merge front over an already
    * aggregated (`c0`.., n_rows) frame — the body shared by
    * [[paretoFrontKD]] and [[onionLayersKD]].
    */
  private def frontOfPts(pts: DataFrame, d: Int): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val dominates = dominatesArr(d) _
    def skyPass(in: DataFrame, parts: Option[Int]): DataFrame = {
      val keyed = in.withColumn("__s",
        (0 until d).map(i => col(s"c$i")).reduce(_ + _))
      val arranged = parts.fold(keyed)(n => keyed.repartition(n))
        .sortWithinPartitions(col("__s").desc)
        .select(array((0 until d).map(i => col(s"c$i")): _*).as("c"),
          col("n_rows"))
      arranged.as[(Array[Long], Long)]
        .mapPartitions { it =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Long)]
          it.foreach { p =>
            if (!buf.exists(q => dominates(q._1, p._1))) buf += p
          }
          buf.iterator
        }
        .toDF("c", "n_rows")
        .select((0 until d).map(i => col("c")(i).as(s"c$i")) :+ col("n_rows"): _*)
    }
    skyPass(skyPass(pts, None), Some(1))
  }

  /** ONION LAYERS (skyline depth, Chang et al.'s onion technique): peel
    * the Pareto front `layers` times — layer 1 is [[paretoFrontKD]],
    * layer l+1 is the front of what the first l layers left. The
    * curation reading: quality TIERS rather than a single frontier
    * ("the best, the next-best, ..."), which is how a token budget
    * larger than the front gets spent. Each layer is one front pass
    * over the (shrinking) distinct-point frame plus an anti-join;
    * fronts rebase on cached RDD leaves (the materializeLeaf
    * discipline) because each feeds both the output union and the next
    * layer's anti-join — `layers` is a small constant by design.
    * Returns (layer, `c0`..`c{d-1}`, n_rows); points below layer
    * `layers` are excluded (the unreached-exclusion contract).
    */
  def onionLayersKD(df: DataFrame, coords: Seq[Column], layers: Int): DataFrame = {
    require(coords.length >= 2, s"need >= 2 dimensions, got ${coords.length}")
    require(layers >= 1, s"layers must be >= 1, got $layers")
    val d = coords.length
    val spark = df.sparkSession
    var remaining = aggregatePts(df, coords)
    var out: DataFrame = null
    for (l <- 1 to layers) {
      val front = frontOfPts(remaining, d)
      val fRdd = front.rdd
      fRdd.cache(); fRdd.count()
      val f = spark.createDataFrame(fRdd, front.schema)
      val layered = f.withColumn("layer", lit(l.toLong))
      out = if (out == null) layered else out.unionByName(layered)
      if (l < layers)
        remaining = remaining.join(
          f.select((0 until d).map(i => col(s"c$i")): _*),
          (0 until d).map(i => s"c$i"), "left_anti")
    }
    out.select(col("layer") +: (0 until d).map(i => col(s"c$i")) :+
      col("n_rows"): _*)
  }

  /** PER-GROUP k-dimensional Pareto front — "the quality frontier PER
    * SOURCE": [[paretoFrontKD]] evaluated independently within every
    * `groupCol` value, in two passes over ALL groups at once (never a
    * per-group job). Same Börzsönyi decomposition and the same exact
    * sum-DESC append-only buffer argument — dominance is only defined
    * WITHIN a group, so the local pass keys its buffers by group (the
    * partition-wide sum order restricted to one group is still that
    * group's sum order: a subsequence of a sorted sequence is sorted),
    * and the merge pass repartitions by group so each group's local
    * fronts meet in exactly one task. Merge input is Σ local front
    * sizes per group — front-sized, not data-sized; the
    * [[paretoFrontKD]] contract (fronts stay task-manageable) applies
    * per group.
    *
    * Returns (`grp`, `c0`..`c{d-1}`, `n_rows`) with `grp` keeping the
    * input column's type; null groups are dropped (no dominance context).
    */
  def paretoFrontKDByGroup(df: DataFrame, groupCol: Column,
                           coords: Seq[Column]): DataFrame = {
    require(coords.length >= 2, s"need >= 2 dimensions, got ${coords.length}")
    val d = coords.length
    val named = coords.zipWithIndex.map { case (c, i) => c.cast("long").as(s"c$i") }
    val pts = df.select(groupCol.as("grp") +: named: _*)
      .filter(col("grp").isNotNull &&
        (0 until d).map(i => col(s"c$i").isNotNull).reduce(_ && _))
      .groupBy(col("grp") +: (0 until d).map(i => col(s"c$i")): _*)
      .agg(count(lit(1)).as("n_rows"))
    val outSchema = pts.schema
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    def dominates(a: Array[Long], b: Array[Long]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (i < d && ge) {
        if (a(i) < b(i)) ge = false else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    def skyPass(in: DataFrame, mergeByGroup: Boolean): DataFrame = {
      val keyed = in.withColumn("__s",
        (0 until d).map(i => col(s"c$i")).reduce(_ + _))
      val arranged = (if (mergeByGroup) keyed.repartition(col("grp")) else keyed)
        .sortWithinPartitions(col("__s").desc)
        .select(outSchema.fieldNames.map(col).toSeq: _*)
      arranged.mapPartitions { it =>
        val bufs = scala.collection.mutable.HashMap
          .empty[Any, scala.collection.mutable.ArrayBuffer[(Array[Long], org.apache.spark.sql.Row)]]
        it.foreach { r =>
          val c = Array.tabulate(d)(i => r.getLong(i + 1))
          val buf = bufs.getOrElseUpdate(r.get(0),
            scala.collection.mutable.ArrayBuffer.empty)
          if (!buf.exists(q => dominates(q._1, c))) buf += ((c, r))
        }
        bufs.valuesIterator.flatMap(_.iterator.map(_._2))
      }
    }
    skyPass(skyPass(pts, mergeByGroup = false), mergeByGroup = true)
  }
}
