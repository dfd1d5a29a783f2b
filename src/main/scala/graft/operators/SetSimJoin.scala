package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact token-set similarity join via PREFIX FILTERING (the
  * AllPairs/PPJoin candidate rule — Bayardo et al. 2007, Xiao et al. 2008):
  * the scalable sibling of q43's bounded cross join and the MinHash/LSH
  * family's exact cousin. Where LSH banding (operators/Dedup.scala) trades
  * recall for blocking, prefix filtering is LOSSLESS: order every record's
  * tokens by one global rarity order; a record whose qualifying partners
  * must share >= cmin of its n tokens keeps a prefix of p = n − cmin + 1
  * rarest tokens; the shared cmin tokens cannot all hide in the n − p =
  * cmin − 1 suffix positions — so every qualifying pair collides on some
  * prefix token and the exact array-intersection verify never misses.
  *
  * The measures differ only in cmin — the minimum intersection a
  * qualifying partner can have, minimized over partner sizes the length
  * filter admits:
  *   - Jaccard >= τ:  c >= τ(na+nb)/(1+τ), nb >= τ·na  ⇒ cmin = ⌈τ·n⌉
  *   - cosine  >= τ:  c >= τ√(na·nb),      nb >= τ²·na ⇒ cmin = ⌈τ²·n⌉
  *   - Dice    >= τ:  c >= τ(na+nb)/2,  nb >= na·τ/(2−τ) ⇒ cmin = ⌈n·τ/(2−τ)⌉
  *   - overlap >= t (absolute):                            cmin = t
  * (The overlap COEFFICIENT c/min(na,nb) admits no content-independent
  * prefix: a 1-token subset qualifies at any τ, so its required overlap
  * does not grow with n — the absolute-t form is the classic blocked
  * variant, and callers can post-filter a coefficient from the returned
  * exact sizes.)
  *
  * Scale shape: document frequencies are one map-side-combined count;
  * per-record ordering is a sort of each record's OWN tokens (no global
  * sort); candidates are an equi-join on the prefix token — the rarest
  * tokens in the corpus, so bucket sizes are the SMALLEST frequency tail,
  * never a cartesian; pairs deduplicate before the verify so each
  * candidate costs one intersection. Float discipline: prefix lengths and
  * the length filter use a 1e-6 slack in the OVER-covering direction only
  * (completeness is never at the mercy of a rounded threshold crossing an
  * integer); the final verify is exact integer arithmetic plus at most
  * one correctly-rounded IEEE op (one division, or division-by-sqrt) —
  * bit-identical to any engine evaluating the same definition.
  */
object SetSimJoin {

  /** The measure-specific pieces of the prefix-filter join. `cmin` must
    * UNDER-estimate (slack downward) the true minimum intersection —
    * a too-small cmin lengthens the prefix and only over-covers.
    */
  private sealed trait Measure {
    def cmin(n: Column): Column
    def lengthOk(na: Column, nb: Column): Column
    /** PAIR-level minimum qualifying intersection α(na, nb) for the
      * POSITIONAL filter (slacked downward like [[cmin]]): at a prefix
      * collision at 1-based positions (i, j) the overlap is at most
      * 1 + min(na−i, nb−j) when no earlier token is shared, so a
      * qualifying pair's FIRST common token always satisfies
      * 1 + min(na−i, nb−j) >= α — filtering collisions on it before the
      * pair-dedup is lossless (Xiao et al. 2008, §3.2).
      */
    def pairMinOverlap(na: Column, nb: Column): Column
    def simName: String
    def sim(c: Column, na: Column, nb: Column): Column
    def keep(sim: Column): Column
  }

  private final case class JaccardM(tau: Double) extends Measure {
    def cmin(n: Column): Column = ceil(n * lit(tau) - lit(1e-6)).cast("int")
    def lengthOk(na: Column, nb: Column): Column =
      na >= nb * lit(tau) - lit(1e-6) && nb >= na * lit(tau) - lit(1e-6)
    def pairMinOverlap(na: Column, nb: Column): Column =
      ceil((na + nb) * lit(tau / (1.0 + tau)) - lit(1e-6)).cast("int")
    def simName = "jaccard"
    def sim(c: Column, na: Column, nb: Column): Column =
      c.cast("double") / (na + nb - c)
    def keep(s: Column): Column = s >= lit(tau)
  }

  private final case class CosineM(tau: Double) extends Measure {
    private val t2 = tau * tau
    def cmin(n: Column): Column = ceil(n * lit(t2) - lit(1e-6)).cast("int")
    def lengthOk(na: Column, nb: Column): Column =
      na >= nb * lit(t2) - lit(1e-6) && nb >= na * lit(t2) - lit(1e-6)
    def pairMinOverlap(na: Column, nb: Column): Column =
      ceil(sqrt((na * nb).cast("double")) * lit(tau) - lit(1e-6)).cast("int")
    def simName = "cosine"
    def sim(c: Column, na: Column, nb: Column): Column =
      c.cast("double") / sqrt((na * nb).cast("double"))
    def keep(s: Column): Column = s >= lit(tau)
  }

  private final case class DiceM(tau: Double) extends Measure {
    private val r = tau / (2.0 - tau)
    def cmin(n: Column): Column = ceil(n * lit(r) - lit(1e-6)).cast("int")
    def lengthOk(na: Column, nb: Column): Column =
      na >= nb * lit(r) - lit(1e-6) && nb >= na * lit(r) - lit(1e-6)
    def pairMinOverlap(na: Column, nb: Column): Column =
      ceil((na + nb) * lit(tau / 2.0) - lit(1e-6)).cast("int")
    def simName = "dice"
    def sim(c: Column, na: Column, nb: Column): Column =
      (c * 2).cast("double") / (na + nb)
    def keep(s: Column): Column = s >= lit(tau)
  }

  private final case class OverlapM(t: Int) extends Measure {
    def cmin(n: Column): Column = lit(t)
    def lengthOk(na: Column, nb: Column): Column = na >= t && nb >= t
    def pairMinOverlap(na: Column, nb: Column): Column = lit(t)
    def simName = "overlap"
    def sim(c: Column, na: Column, nb: Column): Column = c.cast("long")
    def keep(s: Column): Column = s >= lit(t.toLong)
  }

  /** All unordered pairs (doc_a < doc_b) with exact Jaccard >= tau over the
    * distinct elements of `tokensCol`, with the similarity. Records with
    * empty token sets never pair (Jaccard undefined).
    *
    * STORAGE CONTRACT (caller releases): the rarity-ordered per-record
    * token-array frame persists and outlives this call — release with
    * [[graft.Storage.releaseAll]] after consuming the result, the same
    * ownership rule as [[joinSelfWeighted]]. Applies to every joinSelf…/
    * joinContainment… entry point (all share [[joinBy]]'s or
    * [[joinContainment]]'s persisted frames).
    */
  def joinSelf(df: DataFrame, idCol: String, tokensCol: String,
               tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    joinBy(df, idCol, tokensCol, JaccardM(tau))
  }

  /** Pairs with exact set cosine |A∩B|/√(|A|·|B|) >= tau. */
  def joinSelfCosine(df: DataFrame, idCol: String, tokensCol: String,
                     tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    joinBy(df, idCol, tokensCol, CosineM(tau))
  }

  /** Pairs with exact Dice 2|A∩B|/(|A|+|B|) >= tau. */
  def joinSelfDice(df: DataFrame, idCol: String, tokensCol: String,
                   tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    joinBy(df, idCol, tokensCol, DiceM(tau))
  }

  /** Pairs sharing at least `minOverlap` distinct tokens (the classic
    * t-overlap join); the returned `overlap` is the exact shared count.
    */
  def joinSelfOverlap(df: DataFrame, idCol: String, tokensCol: String,
                      minOverlap: Int): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    joinBy(df, idCol, tokensCol, OverlapM(minOverlap))
  }

  /** DIRECTED containment pairs: (subject, container) with
    * |A∩B| / |A| >= tau, A ≠ B — the asymmetric near-dup question the
    * symmetric measures cannot ask ("is this document mostly a quote of
    * that one?"): a 50-token excerpt inside a 5000-token page scores
    * containment 1.0 but Jaccard ~0.01. Containment admits a prefix only
    * on the SUBJECT side (c >= ⌈τ·na⌉ depends on |A| alone; the container
    * may be any size), so the classic blocked form indexes the subject's
    * prefix against ALL container tokens — candidate generation is
    * |prefix_A| × df(token), still driven by the subject's RAREST tokens,
    * never a cartesian. The positional bound applies unchanged: at the
    * pair's first shared token, overlap <= 1 + min(na−i, nb−j), and a
    * qualifying pair needs >= ⌈τ·na⌉. Both id orientations are emitted
    * when both directions qualify (containment is not symmetric).
    */
  def joinSelfContainment(df: DataFrame, idCol: String, tokensCol: String,
                          tau: Double): DataFrame =
    joinContainment(df, df, idCol, tokensCol, tau)

  /** Two-sided [[joinSelfContainment]]: which `subjects` are >= tau
    * contained in which `containers` — the WATCHLIST shape (check a
    * bounded set of documents for quote-inclusion against a whole
    * corpus) and the sparse-bench sibling of the self form, whose cost
    * on a clone-dense corpus is honest output volume. The rarity order
    * comes from the CONTAINER corpus; subject tokens the containers
    * never saw order as df = 0 — rarest, so they fill the prefix first
    * and their (empty) collision lists prune hardest. Rows with equal
    * ids on both sides never pair (the self form's A ≠ B rule).
    */
  def joinContainment(subjects: DataFrame, containers: DataFrame,
                      idCol: String, tokensCol: String,
                      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    def prep(d: DataFrame) =
      d.select(col(idCol).as("doc_id"), array_distinct(col(tokensCol)).as("ts"))
        .withColumn("n", size(col("ts")))
        .filter(col("n") > 0)
    val subj = prep(subjects)
    val cont = prep(containers)
    // dfreq feeds BOTH ordered sides; oa/ob each feed their side's
    // candidate branch AND the verify — all PERSISTED under the
    // joinSelfWeighted storage contract (caller releases)
    val dfreq = cont.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def ordered(d: DataFrame) =
      d.select(col("doc_id"), col("n"), explode(col("ts")).as("tok"))
        .join(dfreq, Seq("tok"), "left")
        .withColumn("df", coalesce(col("df"), lit(0L)))
        .groupBy(col("doc_id"), col("n"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("o"))
        .withColumn("ots", transform(col("o"), s => s.getField("tok")))
        .select(col("doc_id"), col("n"), col("ots"))
    val oa = ordered(subj).withColumn("p", greatest(
      col("n") - ceil(col("n") * lit(tau) - lit(1e-6)).cast("int") + 1, lit(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ob = ordered(cont)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // subject side: prefix tokens only; container side: EVERY token, with
    // its position in the same global rarity order
    val preA = oa.select(col("doc_id").as("doc_a"), col("n").as("na"),
      posexplode(slice(col("ots"), lit(1), col("p"))).as(Seq("ia", "ptok")))
    val allB = ob.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      posexplode(col("ots")).as(Seq("ib", "ptok")))
    val alpha = ceil(col("na") * lit(tau) - lit(1e-6)).cast("int")
    val cand = preA.join(allB, "ptok")
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("nb") >= alpha)
      .filter(lit(1) + least(col("na") - (col("ia") + 1), col("nb") - (col("ib") + 1)) >= alpha)
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    // verify via two pair-keyed joins against the (comparatively tiny)
    // array tables — these BROADCAST, so the collision stream stays thin
    // and each row reads shared array bytes; carrying both arrays through
    // the candidate join instead measured 4× slower at sf0.1 (per-row
    // array copies through the generate+join chain)
    val withSets = cand
      .join(oa.select(col("doc_id").as("doc_a"), col("ots").as("ta")), "doc_a")
      .join(ob.select(col("doc_id").as("doc_b"), col("ots").as("tb")), "doc_b")
    val inter = size(array_intersect(col("ta"), col("tb")))
    withSets
      .withColumn("containment", inter.cast("double") / size(col("ta")))
      .filter(col("containment") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** WEIGHTED Jaccard self-join: pairs with
    * Σ_{t∈A∩B} w_t / Σ_{t∈A∪B} w_t >= tau over INTEGER token weights
    * (rarity/idf-style weights make shared rare tokens count for more
    * than shared stopwords — the weighted refinement of [[joinSelf]]).
    * Integer weights keep the verify exact: shared and union weights
    * are exact long sums and the similarity is ONE correctly-rounded
    * division.
    *
    * The prefix filter generalizes by WEIGHT (Chaudhuri et al. 2006):
    * order every record's tokens by one global total order (rarity
    * here — heaviest first, so prefixes stay short AND collision lists
    * stay small); keep the shortest prefix whose SUFFIX weight is below
    * the minimum qualifying shared weight τ·W_A (a qualifying pair
    * shares >= τ·union >= τ·W_A of weight, which cannot all hide in a
    * lighter suffix) — so every qualifying pair collides on a prefix
    * token, losslessly. Collisions then pass the weight-ratio filter
    * (W_B >= τ·W_A both ways) and the weighted POSITIONAL bound: at the
    * pair's first shared token, shared <= min(suffix_A, suffix_B)
    * including the colliding token, and a qualifying pair needs
    * τ(W_A+W_B)/(1+τ). All threshold comparisons slack 1e-6 in the
    * over-covering direction only (the [[joinBy]] float discipline).
    *
    * Tokens absent from `weights` carry weight `defaultW` (unseen =
    * ordinary). The per-record suffix cumsum runs as one per-doc window
    * over the exploded rows (the measured replacement for an in-array
    * HOF fold — see the inline note below).
    *
    * STORAGE CONTRACT (caller releases): the exploded token-weight frame
    * persists (MEMORY_AND_DISK — measured no worse than DISK_ONLY at the
    * bench scale, and eviction degrades to exactly DISK_ONLY's profile
    * under cluster memory pressure) because several branches of the
    * returned plan read it (prefix, per-doc verify arrays), and nothing
    * inside a lazily returned DataFrame can unpersist it when the
    * caller's action finishes. Ownership sits with the caller — run
    * [[graft.Storage.releaseAll]] after consuming the result (the
    * harness does this after every query action).
    *
    * @param weights (token, weight) frame, one row per token, weight a
    *                positive long
    */
  def joinSelfWeighted(df: DataFrame, idCol: String, tokensCol: String,
                       weights: DataFrame, tau: Double,
                       defaultW: Long = 1L): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    require(defaultW >= 1L, s"defaultW must be >= 1, got $defaultW")
    val w = weights.select(col(weights.columns(0)).as("tok"),
      col(weights.columns(1)).cast("long").as("w"))
    // (w DESC, tok) is the one global total order: heaviest (rarest)
    // tokens first — short prefixes, small collision lists. Everything
    // below works on the EXPLODED (doc, tok, w) rows: cumulative suffix
    // weights come from one per-doc window (millions of doc partitions,
    // never a single task — an in-array HOF cumsum was measured O(n²)
    // per record and 20× slower at sf0.1), and the verify is a
    // pair-keyed join back to these same rows.
    val tw = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(col(tokensCol))).as("tok"))
      .join(w, Seq("tok"), "left")
      .withColumn("w", coalesce(col("w"), lit(defaultW)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w").desc, col("tok"))
    val ordW = byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // whole-partition frame on the SAME (partition, order) spec as the
    // running sum, so both window expressions ride ONE WindowExec pass
    // (an unordered partitionBy spec planned a second Window operator)
    val allW = byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // suffix weight INCLUDING the current token = W − cum + w
    val ranked = tw
      .withColumn("wtotal", sum(col("w")).over(allW))
      .withColumn("suf", col("wtotal") - sum(col("w")).over(ordW) + col("w"))
    // prefix: entries whose suffix can still carry a qualifying overlap
    // (shared >= τ·W_A cannot hide entirely in a lighter tail)
    // persisted (same caller-releases contract as tw): both sides of the
    // candidate self-join read it — unpersisted, the per-doc window sort
    // ran once per side
    val pre = ranked
      .filter(col("suf").cast("double") >= col("wtotal") * lit(tau) - lit(1e-6))
      .select(col("doc_id"), col("wtotal"), col("tok").as("ptok"), col("suf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val minPairShared = (col("wa") + col("wb")).cast("double") *
      lit(tau / (1.0 + tau)) - lit(1e-6)
    val cand = pre
      .select(col("doc_id").as("doc_a"), col("wtotal").as("wa"),
        col("suf").as("sufa"), col("ptok"))
      .join(pre.select(col("doc_id").as("doc_b"), col("wtotal").as("wb"),
        col("suf").as("sufb"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("wa").cast("double") >= col("wb") * lit(tau) - lit(1e-6) &&
        col("wb").cast("double") >= col("wa") * lit(tau) - lit(1e-6))
      .filter(least(col("sufa"), col("sufb")).cast("double") >= minPairShared)
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    // verify: shared weight via ENCODED-STRING array intersection — each
    // doc aggregates once to an array of "<w> <tok>" strings (tokens are
    // \S+ and the weight is a per-token global, so the encoding is
    // injective and e(A)∩e(B) = e(A∩B)); per pair, array_intersect stays
    // on its STRING hash path and one aggregate() fold parses the shared
    // weights back out. MEASURED at sf0.1 (1.76M candidates, 187k true
    // pairs), whole-query isolated min-of-3: 1.95 s with this shape vs
    // 5.8 s with the previous token equi-join verify (cand ⋈ tw on doc_a
    // expanded to Σ|A| ≈ 500M rows through two shuffled joins — a probed
    // 10 s phase of a 17.6 s cold run); a q114-style struct-array verify
    // (array_intersect over (tok, w) structs + fold) 139 s —
    // array_intersect on COMPLEX element types abandons the hash path
    // for quadratic interpreted equality, never use it on structs; an
    // array-contains fold over aligned arrays (O(na·nb) per pair) 46 s.
    // joinContainmentWeighted deliberately KEEPS its equi-join verify:
    // there the container side broadcasts and the same encoded-array
    // rewrite measured SLOWER (5.0 → 7.4 s whole-query iso at sf0.1).
    val docArrs = tw
      .groupBy(col("doc_id"))
      .agg(collect_list(concat(col("w").cast("string"), lit(" "), col("tok")))
          .as("ewts"),
        sum(col("w")).as("wtotal"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withArrs = cand
      .join(docArrs.select(col("doc_id").as("doc_a"), col("ewts").as("ea"),
        col("wtotal").as("wa")), "doc_a")
      .join(docArrs.select(col("doc_id").as("doc_b"), col("ewts").as("eb"),
        col("wtotal").as("wb")), "doc_b")
    withArrs
      .withColumn("shared", aggregate(array_intersect(col("ea"), col("eb")),
        lit(0L), (acc, x) => acc + substring_index(x, " ", 1).cast("long")))
      .withColumn("wjaccard", col("shared").cast("double") /
        (col("wa") + col("wb") - col("shared")))
      .filter(col("wjaccard") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("wjaccard"))
  }

  /** WEIGHTED directed containment join: pairs (subject A, container B)
    * with `wcont(A,B) = Σ_{t∈A∩B} w_t / Σ_{t∈A} w_t >= tau` over INTEGER
    * token weights — [[joinContainment]]'s asymmetric measure under
    * [[joinSelfWeighted]]'s weights. This is quote detection the way a
    * reader means it: with rarity weights (1 + N div df), a subject whose
    * RARE phrases all appear in B is contained even if B lacks the
    * subject's stopwords, and shared boilerplate alone cannot reach τ.
    *
    * SUBJECT-PREFIX BLOCKING (the scale argument, container side has no
    * prefix): order every record's distinct tokens by the one global
    * (w DESC, tok) total order. A qualifying pair shares weight
    * >= τ·W_A, all of it inside A — walking A heaviest-first, that much
    * weight cannot hide entirely in an inclusive-suffix lighter than
    * τ·W_A, so A's first shared token lies in the prefix
    * {t : suf_A(t) >= τ·W_A}. The container side must index EVERY token
    * (containment admits no container-side prefix: W_B is unconstrained
    * upward), exactly as in the unweighted join. Collisions then pass
    * two lossless prunes before the pair-dedup: W_B >= τ·W_A (shared
    * <= W_B), and min(suf_A, suf_B) >= τ·W_A at the collision — a
    * qualifying pair's FIRST shared token satisfies both, so dropping
    * failing collisions loses no pair. All float comparisons slack 1e-6
    * in the over-covering direction only (the [[joinBy]] discipline).
    *
    * VERIFY EXACTNESS: shared weight is an exact long sum via the token
    * equi-join (the [[joinSelfWeighted]] measured-fast shape — never
    * array_intersect on structs), and the containment is ONE
    * correctly-rounded double division shared/W_A — bit-identical to
    * any engine replaying the same integer sums.
    *
    * Tokens absent from `weights` carry `defaultW` on BOTH sides (the
    * weight is a property of the token, so A∩B sums are consistent).
    * Returns (doc_a, doc_b, wcontainment), subjects ≠ containers by id.
    *
    * STORAGE CONTRACT (caller releases): BOTH exploded token-weight
    * frames persist at MEMORY_AND_DISK (each feeds its side's prefix/verify/
    * totals branches) and outlive this call — release with
    * [[graft.Storage.releaseAll]] after consuming the result, the same
    * ownership rule as [[joinSelfWeighted]].
    */
  def joinContainmentWeighted(subjects: DataFrame, containers: DataFrame,
                              idCol: String, tokensCol: String,
                              weights: DataFrame, tau: Double,
                              defaultW: Long = 1L): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    require(defaultW >= 1L, s"defaultW must be >= 1, got $defaultW")
    val w = weights.select(col(weights.columns(0)).as("tok"),
      col(weights.columns(1)).cast("long").as("w"))
    def tw(d: DataFrame) = d.select(col(idCol).as("doc_id"),
        explode(array_distinct(col(tokensCol))).as("tok"))
      .join(w, Seq("tok"), "left")
      .withColumn("w", coalesce(col("w"), lit(defaultW)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val twA = tw(subjects)
    val twB = tw(containers)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w").desc, col("tok"))
    val ordW = byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val allW = byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // inclusive suffix weight = W − cum + w, one per-doc window over the
    // exploded rows (the joinSelfWeighted measured shape; whole-partition
    // frame on the same spec so both sums ride one WindowExec)
    def ranked(t: DataFrame) = t
      .withColumn("wtotal", sum(col("w")).over(allW))
      .withColumn("suf", col("wtotal") - sum(col("w")).over(ordW) + col("w"))
    val preA = ranked(twA)
      .filter(col("suf").cast("double") >= col("wtotal") * lit(tau) - lit(1e-6))
      .select(col("doc_id").as("doc_a"), col("wtotal").as("wa"),
        col("suf").as("sufa"), col("tok").as("ptok"))
    val allB = ranked(twB)
      .select(col("doc_id").as("doc_b"), col("wtotal").as("wb"),
        col("suf").as("sufb"), col("tok").as("ptok"))
    val cand = preA.join(allB, "ptok")
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("wb").cast("double") >= col("wa") * lit(tau) - lit(1e-6))
      .filter(least(col("sufa"), col("sufb")).cast("double") >=
        col("wa") * lit(tau) - lit(1e-6))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val shared = cand
      .join(twA.select(col("doc_id").as("doc_a"), col("tok"), col("w")), Seq("doc_a"))
      .join(twB.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("w")).as("shared"))
    val totalsA = twA.groupBy(col("doc_id"))
      .agg(sum(col("w")).as("wa"))
    shared
      .join(totalsA.select(col("doc_id").as("doc_a"), col("wa")), "doc_a")
      .withColumn("wcontainment", col("shared").cast("double") / col("wa"))
      .filter(col("wcontainment") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("wcontainment"))
  }

  private def joinBy(df: DataFrame, idCol: String, tokensCol: String,
                     m: Measure): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), array_distinct(col(tokensCol)).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") > 0)

    val tok = docs.select(col("doc_id"), col("n"), explode(col("ts")).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    // each record's tokens in (rarity, token) order; prefix p = n−cmin+1
    // (cmin slacked downward — over-covering by one token on an exact
    // threshold boundary is harmless, under-covering would lose pairs).
    // PERSISTED (caller releases via graft.Storage.releaseAll — the
    // joinSelfWeighted storage contract): three branches of the returned
    // plan read it (prefix explode + both verify sides); unpersisted,
    // each branch re-ran the scan→explode→dfreq-join→collect_list chain.
    val ordered = tok.join(dfreq, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("o"))
      .withColumn("ots", transform(col("o"), s => s.getField("tok")))
      .withColumn("p", greatest(col("n") - m.cmin(col("n")) + 1, lit(1)))
      .select(col("doc_id"), col("n"), col("ots"), col("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pre = ordered.select(col("doc_id"), col("n"),
      posexplode(slice(col("ots"), lit(1), col("p"))).as(Seq("i0", "ptok")))
    val cand = pre
      .select(col("doc_id").as("doc_a"), col("n").as("na"), col("i0").as("ia"), col("ptok"))
      .join(pre.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("i0").as("ib"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b"))
      // size filter implied by the measure's threshold; slack keeps it
      // prune-only at float boundaries
      .filter(m.lengthOk(col("na"), col("nb")))
      // POSITIONAL filter (Xiao et al. 2008): at this collision (1-based
      // positions ia+1, ib+1 in the full rarity order) the overlap cannot
      // exceed 1 + min(remaining tokens of each side) unless an EARLIER
      // token is shared — and a qualifying pair's first shared token both
      // lies in the two prefixes and passes this bound, so dropping
      // failing collisions before the pair-dedup is lossless. Measured on
      // the documents corpus (SetSimPosProbe): collisions halve at
      // mid-τ (26.0M → 10.6M at cosine τ=0.9, verify set −7%), no-op but
      // also cost-free at the ≥0.95 gate regimes.
      .filter(lit(1) + least(col("na") - (col("ia") + 1), col("nb") - (col("ib") + 1)) >=
        m.pairMinOverlap(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    val withSets = cand
      .join(ordered.select(col("doc_id").as("doc_a"), col("ots").as("ta")), "doc_a")
      .join(ordered.select(col("doc_id").as("doc_b"), col("ots").as("tb")), "doc_b")

    val inter = size(array_intersect(col("ta"), col("tb")))
    withSets
      .withColumn(m.simName, m.sim(inter, size(col("ta")), size(col("tb"))))
      .filter(m.keep(col(m.simName)))
      .select(col("doc_a"), col("doc_b"), col(m.simName))
  }
}
