package graft.pipelines

import graft.ops.Closure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full re-derivation of the succession-paths table from a raw successor
  * edge list — scripts/org-changes/build_all_org_changes.R:62-231, the
  * richest relational program in the reference: iterative path expansion
  * with per-hop dates and change types, name-change vs merger refinement,
  * split detection, and the complicated/adjacent-path classification.
  *
  * Scale posture: the edge list (organisational changes) is tiny relative
  * to any fact table, so every join here broadcasts it; path expansion is
  * `maxHops` broadcast joins (the reference hard-codes 3 hop columns), and
  * each classification step is a groupBy/semi-join over the already-small
  * changed-paths frame. Nothing in this operator shuffles a large input.
  *
  * Input schema: (old_code, new_code, change_date) — one row per
  * succession edge; multiple rows per old_code encode a split.
  * Output schema = the committed all_org_changes_paths CSV
  * (GoldenDerivePathsSpec pins all 677 rows round-tripped from it).
  */
object OrgChangePaths {

  def derivePaths(successors: DataFrame, maxHops: Int = 3): DataFrame = {
    // Rebase a frame onto a cached-RDD leaf relation. The derivation below
    // references its intermediate frames many times (semi joins, grouped
    // lookups, the final re-attachment), and Spark 4's analyzer re-expands
    // every reference — without a leaf rebase the unresolved plan tree grows
    // exponentially and analysis itself OOMs (same failure mode as
    // [[graft.ops.Closure]]'s iteration; `cache()` alone does not help
    // because caching is a physical-plan property, not a logical leaf).
    // The frames materialized here are change-event tables — hundreds to
    // thousands of rows even for a national registry — so the cost is nil.
    // Every leaf cache is tracked and released before derivePaths returns.
    val cachedLeaves = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def leaf(df: DataFrame): DataFrame = {
      val rdd = df.rdd
      rdd.cache()
      rdd.count()
      cachedLeaves += rdd
      df.sparkSession.createDataFrame(rdd, df.schema)
    }

    val edges = successors.select(col("old_code").as("e_src"),
      col("new_code").as("e_dst"), col("change_date").as("e_date"))
    // a src with >1 successors is a split — every branch row is typed 'split'
    // (build_all_org_changes.R:100-102: lengths(new_code_var) > 1).
    // Materialized once: each of the maxHops expansion joins broadcasts this
    // frame, and a leaf keeps them from re-running the count aggregation.
    val eCnt = edges.groupBy(col("e_src")).agg(count(lit(1)).as("e_nsucc"))
    val edgesC = leaf(edges.join(eCnt, Seq("e_src")))

    // Every code ever seen starts its own chain (R:62-68); codes that never
    // changed drop out after expansion via the !is.na(new_code_1) filter.
    val allCodes = edges.select(col("e_src").as("code"))
      .union(edges.select(col("e_dst"))).distinct()

    var m = allCodes.select(col("code").as("old_code"), col("code").as("new_code_0"))
    for (i <- 1 to maxHops) {
      m = m.join(broadcast(edgesC), col(s"new_code_${i - 1}") === col("e_src"), "left")
        .withColumn(s"new_code_$i", col("e_dst"))
        .withColumn(s"date_change_$i", col("e_date"))
        .withColumn(s"change_type_$i",
          when(col("e_dst").isNull, lit(null).cast("string"))
            .when(col("e_nsucc") > 1, lit("split"))
            .otherwise(lit("merger_or_name_change")))
        .drop("e_src", "e_dst", "e_date", "e_nsucc")
    }
    val paths = leaf(m.filter(col("new_code_1").isNotNull))

    // original paths = chains not contained in a longer one (R:112-117)
    val hopCols = (1 to maxHops).map(i => s"new_code_$i")
    val succCodes = hopCols.map(c => paths.filter(col(c).isNotNull).select(col(c).as("__c")))
      .reduce(_ union _).distinct()
    var o = paths.join(broadcast(succCodes), col("old_code") === col("__c"), "left_anti")

    // name-change refinement (R:119-144): a merger target reached from only
    // ONE distinct predecessor is a pure renaming, not a merger. The R code
    // re-labels every row with that target (whatever its own change type),
    // then downgrades the remaining merger_or_name_change to merger.
    // The maxHops rounds are independent (round i writes only change_type_i
    // and reads only hop-i columns, none of which earlier rounds touch), so
    // ONE long-format aggregation finds every hop's single-predecessor
    // merger targets instead of 2×maxHops separate aggregation jobs.
    val hopLong = (1 to maxHops).map { i =>
      o.select(lit(i).as("__hop"), col(s"new_code_${i - 1}").as("__prev"),
        col(s"new_code_$i").as("__nc"), col(s"change_type_$i").as("__ct"))
    }.reduce(_ union _).filter(col("__nc").isNotNull)
    val nameChangedAll = leaf(hopLong
      .groupBy(col("__hop"), col("__nc"))
      .agg(countDistinct(col("__prev")).as("__nprev"),
        max(when(col("__ct") === "merger_or_name_change", 1).otherwise(0)).as("__anymerge"))
      .filter(col("__nprev") === 1 && col("__anymerge") === 1)
      .select(col("__hop"), col("__nc")))
    for (i <- 1 to maxHops) {
      val nc = s"new_code_$i"
      val ct = s"change_type_$i"
      val nameChanged = nameChangedAll.filter(col("__hop") === i)
        .select(col("__nc").as("__ncc"))
      o = o.join(broadcast(nameChanged), col(nc) === col("__ncc"), "left")
        .withColumn(ct,
          when(col("__ncc").isNotNull, lit("name_change"))
            .when(col(ct) === "merger_or_name_change", lit("merger"))
            .otherwise(col(ct)))
        .drop("__ncc")
    }

    val ncN = (1 to maxHops).map(i => col(s"new_code_$i"))
    val cts = (1 to maxHops).map(i => col(s"change_type_$i"))
    def ctHas(v: String) =
      cts.map(c => when(c === v, 1).otherwise(0)).reduce(_ + _) > 0
    o = leaf(o.withColumn("final_code", coalesce(ncN.reverse: _*))
      .withColumn("experiences_split", when(ctHas("split"), 1).otherwise(0)))

    // complicated-path classification (R:152-231)
    val splitRows = o.filter(col("experiences_split") === 1)
    val linked = (col("old_code") +: ncN)
      .map(c => splitRows.select(c.as("__c")))
      .reduce(_ union _).filter(col("__c").isNotNull).distinct()
    val touchesLinked = (col("old_code") +: ncN)
      .map(c => c === col("__c")).reduce(_ || _)
    var compl = o.join(broadcast(linked), touchesLinked, "left_semi")
      .withColumn("direct_path_complicated",
        when(ctHas("merger") && ctHas("split"), lit("later_merger"))
          .when(ctHas("name_change") && ctHas("split"), lit("later_name_change"))
          .otherwise(lit("no")))
      .withColumn("adjacent_to_complicated", when(!ctHas("split"), 1).otherwise(0))

    // a target multiple distinct trusts split INTO is itself complicated
    // (R:196-216); sequential because round i reads round i-1's labels
    for (i <- 1 to maxHops) {
      val prevC = s"new_code_${i - 1}"
      val nc = s"new_code_$i"
      val ct = s"change_type_$i"
      val sfm = compl
        .filter(col(ct) === "split" && col("direct_path_complicated") === "no")
        .groupBy(col(nc))
        .agg(countDistinct(col(prevC)).as("__np"))
        .filter(col("__np") > 1)
        .select(col(nc).as("__sfm"))
      compl = compl.join(broadcast(sfm), col(nc) === col("__sfm"), "left")
        .withColumn("direct_path_complicated",
          when(col("__sfm").isNotNull && col("adjacent_to_complicated") === 0,
            lit("split_from_multiple"))
            .otherwise(col("direct_path_complicated")))
        .drop("__sfm")
    }

    // a clean split with one branch feeding a split_from_multiple target is
    // adjacent to the complication (R:218-226)
    val sic = compl.filter(col("direct_path_complicated") === "split_from_multiple")
      .select(col("old_code").as("__sic")).distinct()
    compl = leaf(compl.join(broadcast(sic), col("old_code") === col("__sic"), "left")
      .withColumn("adjacent_to_complicated",
        when(col("__sic").isNotNull && col("direct_path_complicated") === "no", 1)
          .otherwise(col("adjacent_to_complicated")))
      .drop("__sic"))

    // chains ending cleanly everywhere are NOT complicated (R:228-236);
    // everything else sharing that final code is
    val ncs = compl.groupBy(col("final_code"))
      .agg(max(col("adjacent_to_complicated")).as("__maxadj"),
        min(when(col("direct_path_complicated") === "no", 1).otherwise(0)).as("__alldpc"))
      .filter(col("__maxadj") === 0 && col("__alldpc") === 1)
      .select(col("final_code").as("__ncs"))
    val pcp = leaf(compl.join(broadcast(ncs), col("final_code") === col("__ncs"), "left_anti")
      .select(col("final_code").as("__pcp")).distinct())
    val complFinal = compl
      .join(broadcast(pcp), col("final_code") === col("__pcp"), "left_semi")
      .select((col("old_code").as("__jo") +:
        (1 to maxHops).map(i => col(s"new_code_$i").as(s"__jnc$i"))) ++
        Seq(col("direct_path_complicated").as("__dpc"),
          col("adjacent_to_complicated").as("__adj")): _*)

    // re-attach the classification (plyr::join on the common columns — a
    // path row is identified by its full code chain, R:239-244)
    val joinKey = (col("old_code") === col("__jo")) +:
      (1 to maxHops).map(i => col(s"new_code_$i") <=> col(s"__jnc$i"))
    val out = o
      .join(broadcast(complFinal), joinKey.reduce(_ && _), "left")
      .join(broadcast(pcp), col("final_code") === col("__pcp"), "left")
      .withColumn("direct_path_complicated", coalesce(col("__dpc"), lit("no")))
      .withColumn("adjacent_to_complicated", coalesce(col("__adj"), lit(0)))
      .withColumn("part_of_complicated_path", when(col("__pcp").isNotNull, 1).otherwise(0))

    val hopTriples = (1 to maxHops).flatMap(i =>
      Seq(col(s"new_code_$i"), col(s"date_change_$i"), col(s"change_type_$i")))
    val result = out.select((Seq(col("old_code"), col("new_code_0")) ++ hopTriples ++ Seq(
      col("final_code"), col("experiences_split"), col("direct_path_complicated"),
      col("adjacent_to_complicated"), col("part_of_complicated_path"))): _*)
    // The finished paths table is change-event-sized (it is broadcast at
    // every downstream use), so materialize it into a driver-local relation
    // and release every intermediate leaf cache — derivePaths retains zero
    // executor storage after it returns.
    val rows = result.collect()
    cachedLeaves.foreach(_.unpersist(blocking = false))
    successors.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
  }
}

/** Org-change lookup derivations over the committed succession-paths table
  * (`data/org-changes/all_org_changes_paths_2000_2018.csv`), re-expressing
  * scripts/org-changes/build_trust_lookup.R Spark-first. The closure itself
  * runs on the generic [[graft.ops.Closure]] pointer-doubling operator;
  * GoldenOrgChangesSpec pins both stages against the committed outputs.
  */
object OrgChanges {

  /** Edge list (src → dst) from the paths table's hop columns
    * (new_code_0 = old_code, hops new_code_1..3; NA-terminated).
    */
  def edgesFromPaths(paths: DataFrame): DataFrame = {
    val hops = Seq("new_code_0" -> "new_code_1", "new_code_1" -> "new_code_2",
      "new_code_2" -> "new_code_3")
    hops.map { case (a, b) =>
      paths.filter(col(b).isNotNull && col(b) =!= "NA")
        .select(col(a).as("src"), col(b).as("dst"))
    }.reduce(_ union _).distinct()
  }

  /** Every code appearing anywhere in a chain. */
  def allCodes(paths: DataFrame): DataFrame =
    Seq("old_code", "new_code_1", "new_code_2", "new_code_3")
      .map(c => paths.filter(col(c).isNotNull && col(c) =!= "NA").select(col(c).as("node")))
      .reduce(_ union _).distinct()

  /** (old_code, final_code, hops): closure of every known code. */
  def resolved(paths: DataFrame): DataFrame =
    Closure.resolve(allCodes(paths), edgesFromPaths(paths))

  /** Re-derivation of trust_lookup_uncomplicated_changes.csv
    * (build_trust_lookup.R:66-109): closure mapping, minus identity rows,
    * joined to the unproblematic path classification, clean splits re-coded
    * as backwards mergers by swapping old/final (the reference's U6 value
    * swap, build_trust_lookup.R:104-107).
    */
  def trustLookup(paths: DataFrame): DataFrame = {
    val mapping = resolved(paths)
      .select(col("old_code"), col("final_code"))
      .filter(col("old_code") =!= col("final_code"))
      .distinct()

    val unproblematic = paths
      .filter(col("part_of_complicated_path") === "0")
      .select(col("experiences_split").cast("int").as("experiences_split"), col("final_code"))
      .distinct()

    val joined = mapping.join(broadcast(unproblematic), Seq("final_code"), "left")
      .withColumn("problematic", when(col("experiences_split").isNull, 1).otherwise(0))

    // U6 value swap: clean splits become backwards mergers
    val swap = col("experiences_split") === 1 && col("problematic") === 0
    joined.select(
      when(swap, col("final_code")).otherwise(col("old_code")).as("old_code"),
      when(swap, col("old_code")).otherwise(col("final_code")).as("final_code"),
      col("experiences_split"),
      col("problematic"))
  }
}
