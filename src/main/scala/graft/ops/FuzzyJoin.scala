package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance record linkage without all-pairs: FastSS / symmetric-delete
  * blocking (Bocek et al. 2007, "Fast Similarity Search in Large
  * Dictionaries"). The reference harmonises trust identities across vintages
  * by exact code joins plus hand-curated rename tables
  * (scripts/org-changes/build_trust_lookup.R:24-46); a 100 TB corpus needs
  * the automated sibling — linking near-identical name strings — and the
  * naive form is a quadratic cross join.
  *
  * Candidate generation is LOSSLESS for levenshtein <= d: align any edit
  * script between a and b, delete from `a` its substituted+deleted
  * positions and from `b` its substituted+inserted positions — both at most
  * d deletions — and the remainders are the same matched subsequence. So
  * joining the <=d-deletion neighborhoods by equality finds every true
  * pair, and the exact (codegen'd, built-in) `levenshtein` verify removes
  * false candidates. No distance computation ever runs outside a shared
  * blocking bucket.
  *
  * Scale shape: neighborhoods are generated per-row (no shuffle), the
  * candidate join is a plain equi-join on the variant string (shuffle on
  * the variant hash — never a cartesian), and pairs are deduplicated
  * before the verify so each candidate pair costs one distance. Variant
  * count is C(len, <=d) per string: right-sized for linkage distances
  * d <= 2; beyond that, segment-partition blocking (PassJoin) is the
  * appropriate tool and this operator refuses rather than degrade.
  */
object FuzzyJoin {

  /** All strings obtainable from `s` by deleting at most `d` characters,
    * deduplicated, including `s` itself (the d=0 variant).
    */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2,
      s"deletion-neighborhood blocking is for linkage distances 1..2, got $d" +
        " — use PassJoin.linkSelf/link for larger radii")
    var acc = array(s)
    for (_ <- 1 to d) {
      val expanded = flatten(transform(acc, v =>
        when(length(v) <= 0, array()).otherwise(
          transform(sequence(lit(1), length(v)), i =>
            concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v)))))))
      acc = array_distinct(concat(acc, expanded))
    }
    acc
  }

  /** Link `left` to `right`: every (id_a, id_b) with
    * levenshtein(name_a, name_b) <= maxDist, with the exact distance.
    */
  def link(left: DataFrame, right: DataFrame,
           leftId: String, leftStr: String,
           rightId: String, rightStr: String, maxDist: Int): DataFrame = {
    val lv = left.select(col(leftId).as("id_a"), col(leftStr).as("name_a"),
      explode(deletionVariants(col(leftStr), maxDist)).as("__v"))
    val rv = right.select(col(rightId).as("id_b"), col(rightStr).as("name_b"),
      explode(deletionVariants(col(rightStr), maxDist)).as("__v"))
    lv.join(rv, "__v")
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Self-linkage: unordered pairs (id_a < id_b) within `maxDist`. */
  def linkSelf(df: DataFrame, idCol: String, strCol: String, maxDist: Int): DataFrame =
    link(df, df, idCol, strCol, idCol, strCol, maxDist)
      .filter(col("id_a") < col("id_b"))

  /** Transposition-aware self-linkage: unordered pairs (id_a < id_b) with
    * full Damerau–Levenshtein distance <= 1, plus the classic levenshtein
    * alongside (the pairs where dl < lev are exactly the transposition
    * catches the q113 family misses).
    *
    * Blocking stays lossless: one DL operation is at most two classic
    * edits (a transposition is two substitutions in levenshtein terms),
    * so every DL<=1 pair has levenshtein <= 2 and is caught by the
    * radius-2 deletion neighborhood. The wider neighborhood (C(len,<=2)
    * variants per row) is the price of transposition awareness at d=1;
    * the verify itself is the codegen'd native
    * [[graft.functions.EditDistanceExpressions.damerauLevenshtein]] run
    * once per deduplicated candidate, never all-pairs.
    */
  def linkSelfDamerau(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val lv = df.select(col(idCol).as("id_a"), col(strCol).as("name_a"),
      explode(deletionVariants(col(strCol), 2)).as("__v"))
    val rv = df.select(col(idCol).as("id_b"), col(strCol).as("name_b"),
      explode(deletionVariants(col(strCol), 2)).as("__v"))
    lv.join(rv, "__v")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"))
      .distinct()
      .withColumn("dl", graft.functions.EditDistanceExpressions
        .damerauLevenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dl") <= 1)
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
  }

  /** Nearest-dictionary-entry match: for every corpus string, the
    * best-Jaro–Winkler entry of a CANONICAL dictionary (ties broken by
    * lowest dictionary id) — the normalization step that maps noisy
    * free-text names onto a fixed vocabulary. JW is not a metric, so
    * there is no lossless blocking (contrast the deletion neighborhoods
    * above); the honest scale shape is exactly this one: the dictionary
    * is FIXED-SIZE by construction, broadcasts, and the whole match is
    * one corpus scan with |dict| codegen'd similarity calls per row —
    * cost linear in the corpus, never all-pairs.
    *
    * The argmax is `min(struct(-jw, dict_id, ...))`: negation is
    * IEEE-exact and bijective, so the struct order IS
    * (jw DESC, dict_id ASC), and the served double re-negates back
    * bit-identically.
    *
    * The broadcast-sized contract is a GUARD, not lore: the operator
    * counts the dictionary and refuses above `maxDictRows` (default
    * 100k — comfortably broadcastable rows of (id, short string), and
    * already 100k similarity calls per corpus row). A million-row
    * "dictionary" is not a normalization vocabulary; route it through a
    * cheap prefilter (length / prefix banding) and a JW verify on the
    * survivors instead of this operator.
    */
  def dictionaryMatch(corpus: DataFrame, corpusId: String, corpusStr: String,
                      dict: DataFrame, dictId: String, dictStr: String,
                      maxDictRows: Long = 100000L): DataFrame = {
    val d = dict.select(col(dictId).as("dict_id"), col(dictStr).as("dict_name"))
    val nDict = d.count()
    require(nDict <= maxDictRows,
      s"dictionaryMatch pairs the whole corpus against a BROADCAST dictionary; got $nDict " +
        s"dictionary rows > maxDictRows=$maxDictRows. JW admits no lossless blocking, so a " +
        "dictionary this large needs a prefilter (length/prefix banding) before the JW " +
        "verify — raise maxDictRows only if the executors can really hold the build side")
    val pairs = corpus
      .select(col(corpusId).as("id"), col(corpusStr).as("name"))
      .crossJoin(broadcast(d))
      .withColumn("jw", graft.functions.EditDistanceExpressions
        .jaroWinkler(col("name"), col("dict_name")))
    pairs.groupBy(col("id"), col("name"))
      .agg(min(struct((-col("jw")).as("njw"), col("dict_id"),
        col("dict_name"))).as("__best"))
      .select(col("id"), col("name"),
        col("__best.dict_id").as("dict_id"),
        col("__best.dict_name").as("dict_name"),
        (-col("__best.njw")).as("jw"))
  }
}
