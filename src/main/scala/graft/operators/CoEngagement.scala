package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item–item co-engagement projection of a (user, item) interaction log —
  * the graph-construction step between raw event logs and every graph
  * operator in this engine (components, communities, link prediction,
  * PageRank run on "engaged together" edges): two items link weighted by
  * how many distinct users engaged with both.
  *
  * The naive projection is the classic scale bomb: one user with d
  * distinct items contributes d(d−1)/2 pairs, so a single bot/crawler
  * account with 10⁶ items yields 5·10¹¹ pairs on its own. The cap is the
  * fix and is part of the SEMANTICS here (as in the substring-dedup
  * `maxSourcesPerGram` bound): each user contributes only their top
  * `maxItemsPerUser` items by engagement count (ties to the lowest item
  * id — total order, so the cap replays exactly), bounding the per-user
  * expansion at m(m−1)/2 regardless of account pathology.
  *
  * Scale shape: one map-side-combined (user, item) count, a per-USER
  * rank window (partitions are user-sized, never global), the capped
  * self-join shuffling on user, and a map-side-combined pair count.
  * `minUsers` floors the output the way q181's support floor does.
  */
object CoEngagement {

  /** (item_a, item_b, n_users) with item_a < item_b and
    * n_users >= minUsers.
    */
  def project(interactions: DataFrame, userCol: String, itemCol: String,
              maxItemsPerUser: Int, minUsers: Long): DataFrame = {
    require(maxItemsPerUser >= 2, "maxItemsPerUser must be >= 2")
    require(minUsers >= 1, "minUsers must be >= 1")
    val ui = interactions
      .select(col(userCol).as("u"), col(itemCol).as("i"))
      .groupBy(col("u"), col("i")).agg(count(lit(1)).as("n"))
    val capped = ui
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("u")).orderBy(col("n").desc, col("i").asc)))
      .filter(col("rk") <= maxItemsPerUser)
      .select(col("u"), col("i"))
    capped.select(col("u"), col("i").as("item_a"))
      .join(capped.select(col("u"), col("i").as("item_b")), Seq("u"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_users")) // capped rows are distinct per user
      .filter(col("n_users") >= minUsers)
  }
}
