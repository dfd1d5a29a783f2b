package graft.pipelines

import graft.ops.Closure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
