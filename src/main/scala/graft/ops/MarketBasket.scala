package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket analysis — co-occurrence counts and association rules
  * (Agrawal & Srikant 1994's support/confidence frame plus lift), the
  * classic retail-analytics pair. Everything is exact integer counting
  * until the last step: confidence and lift are each ONE
  * correctly-rounded division of exact longs, so both replay
  * bit-identically.
  *
  * Scale shape: baskets dedupe to distinct (basket, item) — one
  * shuffle; the pair join is PER-BASKET (equi-join on the basket key,
  * never a cartesian across baskets), so its cost is Σ basket_size² —
  * bounded by the basket-size distribution, the standard market-basket
  * cost model; pair counts and item counts are map-side-combined.
  */
object MarketBasket {

  /** Unordered co-occurrence: (item_a < item_b, n_baskets) with
    * n_baskets >= minSupport.
    */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   minSupport: Long = 1L): DataFrame = {
    val it = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    it.select(col("b"), col("i").as("item_a"))
      .join(it.select(col("b"), col("i").as("item_b")), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }

  /** Directed association rules over pairs at or above `minSupport`:
    * (antecedent, consequent, n_pair, n_ante, confidence, lift) — both
    * directions of every qualifying pair. confidence = n_pair/n_ante;
    * lift = (n_pair · n_baskets_total) / (n_ante · n_cons).
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long = 2L): DataFrame = {
    val it = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val itemCounts = it.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val total = it.select(col("b")).distinct().count()

    val pairs = coOccurrence(df, basketCol, itemCol, minSupport)
    val directed = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_baskets").as("n_pair"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_baskets").as("n_pair")))

    directed
      .join(itemCounts.select(col("i").as("antecedent"), col("n_i").as("n_ante")),
        "antecedent")
      .join(itemCounts.select(col("i").as("consequent"), col("n_i").as("n_cons")),
        "consequent")
      .select(col("antecedent"), col("consequent"), col("n_pair"), col("n_ante"),
        (col("n_pair").cast("double") / col("n_ante")).as("confidence"),
        ((col("n_pair") * lit(total)).cast("double") /
          (col("n_ante") * col("n_cons"))).as("lift"))
  }
}
