package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{OpModule, Q, Tables}

/** Incremental view maintenance (IVM) — refresh a materialized aggregate
  * from a changelog without re-aggregating the base fact table.
  *
  * This is the aggregate-side twin of the dd9 incremental-dedup store
  * (`graft/quality/DedupOps.scala`): at 100 TB the daily delta is ~0.1–1%
  * of the corpus, and a pipeline that recomputes its per-key statistics
  * (corpus mixtures, per-source token budgets, per-customer rollups) from
  * scratch each refresh spends 100× the I/O the mathematics requires. The
  * fix is classical self-maintainable views: persist MERGEABLE partial
  * state per group and fold the delta in —
  *
  *   - insert-only deltas (ivm1): any commutative-monoid state merges —
  *     count, sum, min, max. Refresh = agg(delta) ∪ store → re-agg on the
  *     view key. Cost ∝ |delta| + |view|; the base rows are never re-read.
  *   - general changelogs with updates/deletes (ivm2): state must form a
  *     commutative GROUP (every contribution invertible) so retractions
  *     apply — count and sum qualify (delete = (-1, -x), update = the
  *     net price change); min/max do NOT (deleting the current minimum
  *     needs the runner-up, which the state no longer holds) and are
  *     deliberately absent from the ivm2 view. Groups whose count reaches
  *     zero leave the view, exactly as a full recompute would drop them.
  *   - min/max under retractions (ivm2b): the classical group-scoped fix
  *     — detect the groups where a removed value reaches the stored
  *     extremum and re-derive ONLY those groups from the (bucketed)
  *     base, merging everywhere else ([[refreshWithRetractionsFull]]);
  *     cost is a sliver of the fact table instead of the full-recompute
  *     fallback a MIN/MAX-bearing view otherwise forces under CDC.
  *
  * Numeric posture: sums are maintained in DECIMAL(18,4)-derived partials
  * (the repo-wide [[graft.Dec]] idiom) so base+delta merge arithmetic is
  * EXACT — a double-typed store would make the refreshed view differ from
  * the full-recompute oracle by float-association noise, turning every
  * refresh into a slow numeric drift. The cast to double happens once, on
  * the final projection.
  *
  * Scale shape: one shuffle per refresh (the groupBy on the view key,
  * map-side partials first). At deployment the store and the adjustment
  * stream would both be bucketed by the view key (the measured g1b
  * pattern), making the merge exchange-free; the store itself is
  * group-cardinality-sized, not fact-sized, and rolls forward under the
  * versioned claim-commit protocol of [[graft.etl.StoreFs]].
  *
  * Reference analog: the reference pipeline recomputes its per-event
  * summary dictionaries from the full file list on every run
  * (voxel_to_instance_data.py's rebuild loop); this module is the
  * incremental posture the same statistics need at 100 TB.
  */
object IvmOps extends OpModule {

  /** Partial-sum decimal type: exact for TPC-H-ish prices, and its Spark
    * SUM widens to DECIMAL(28,4) — the store's on-disk type.
    */
  private val D = DecimalType(18, 4)

  /** Mergeable per-group partials of one snapshot under a declared view:
    * count/sums/extrema, the full insert-only-maintainable state. Every
    * view's store schema is this function of its [[ViewSpec]].
    */
  def partials(snapshot: DataFrame, v: ViewSpec): DataFrame = {
    val aggs = count(lit(1)).as(v.countOut) +:
      (v.sums.map(sc => sum(col(sc.src).cast(D)).as(sc.out)) ++
        v.exts.map(e =>
          (if (e.isMin) min(col(e.src)) else max(col(e.src))).as(e.out)) ++
        // exact at snapshot grain; REFRESH reads these from the pair
        // store instead (per-batch distinct counts don't merge). A
        // sketched dist estimates through the SAME sketch construction
        // the store path uses, so snapshot-grain and refreshed reads
        // agree by construction.
        v.dists.map(dc => dc.rsd match {
          case None => count_distinct(col(dc.src)).as(dc.out)
          case Some(r) => hll_sketch_estimate(
            hll_sketch_agg(col(dc.src), lit(lgKFor(r)))).as(dc.out)
        }))
    snapshot.groupBy(v.groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** The keyed PAIR STORE seeding one declared `count(DISTINCT src)`:
    * per (group, src-value) multiplicities over a snapshot — the
    * retraction-safe sidecar a distinct count maintains
    * ([[graft.etl.DistAgg]]'s scaladoc). Null source values are
    * excluded, matching count(DISTINCT …)'s null semantics.
    */
  def pairPartials(snapshot: DataFrame, v: ViewSpec, dc: DistAgg): DataFrame =
    snapshot.filter(col(dc.src).isNotNull)
      .groupBy(col(v.groupCol), col(dc.src))
      .agg(count(lit(1)).as("n_dup"))

  /** Register-count exponent for a declared sketch rsd: the smallest
    * lgK with 1.04/√(2^lgK) ≤ rsd (the standard HLL error bound),
    * clamped to DataSketches' supported [4, 21].
    */
  private def lgKFor(rsd: Double): Int = {
    val k = math.pow(1.04 / rsd, 2)
    math.max(4, math.min(21, math.ceil(math.log(k) / math.log(2)).toInt))
  }

  /** The per-group HLL SKETCH STORE seeding one sketched
    * `count(DISTINCT src)` ([[DistAgg.rsd]]): |groups| rows of
    * (group, sketch-binary) — the bounded-size alternative to
    * [[pairPartials]] for ultra-high-cardinality sources. Null source
    * values are excluded, matching count(DISTINCT …)'s null semantics.
    */
  def sketchPartials(snapshot: DataFrame, v: ViewSpec, dc: DistAgg): DataFrame =
    snapshot.filter(col(dc.src).isNotNull)
      .groupBy(v.groupCol)
      .agg(hll_sketch_agg(col(dc.src), lit(lgKFor(dc.rsd.get))).as("sketch"))

  /** Insert-only sketch-store refresh: union + per-group HLL union.
    * The union is associative and commutative at a fixed register
    * count, so the folded store is independent of batch boundaries —
    * the same merge law the pair store satisfies, which is what makes
    * the sketch a legal DECLARED aggregate rather than a one-shot
    * approximation (IvmSpec's ivm8c law pins fold-order independence).
    */
  def refreshSketchesInsertOnly(sketchStore: DataFrame, delta: DataFrame,
      v: ViewSpec, dc: DistAgg): DataFrame =
    sketchStore.unionByName(sketchPartials(delta, v, dc))
      .groupBy(v.groupCol)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** The store one declared distinct maintains — pair multiset when
    * exact, HLL sketch when `rsd` is declared. Stream seeding and the
    * insert-only refresh dispatch through this so a ViewSpec mixing
    * exact and sketched distincts runs both stores side by side.
    */
  def distPartials(snapshot: DataFrame, v: ViewSpec, dc: DistAgg): DataFrame =
    if (dc.rsd.isEmpty) pairPartials(snapshot, v, dc)
    else sketchPartials(snapshot, v, dc)

  /** Insert-only pair-store refresh: the [[refreshInsertOnly]] algebra
    * at pair grain — union + one keyed aggregation, SUM-of-counts
    * associative, so the multiplicities are independent of batch
    * boundaries.
    */
  def refreshPairsInsertOnly(pairStore: DataFrame, delta: DataFrame,
      v: ViewSpec, dc: DistAgg): DataFrame =
    pairStore.unionByName(pairPartials(delta, v, dc))
      .groupBy(col(v.groupCol), col(dc.src))
      .agg(sum("n_dup").as("n_dup"))

  /** Retraction pair-store refresh: the [[refreshWithRetractions]]
    * algebra at pair grain. The changelog's per-source value columns
    * ([[ViewSpec.removedFor]]/[[ViewSpec.addedFor]] — the SAME pair the
    * extremum recompute gate reads) explode to signed multiplicity
    * deltas: an added value is +1 on its (group, value), a removed
    * value −1; pairs retracting to zero leave the store, so the
    * surviving-row count per group IS the exact distinct count under
    * arbitrary insert/update/delete changelogs.
    */
  def refreshPairsWithRetractions(pairStore: DataFrame, changes: DataFrame,
      v: ViewSpec, dc: DistAgg): DataFrame = {
    val adds = changes.filter(col(v.addedFor(dc.src)).isNotNull)
      .select(col(v.groupCol), col(v.addedFor(dc.src)).as(dc.src),
        lit(1L).as("n_dup"))
    val removes = changes.filter(col(v.removedFor(dc.src)).isNotNull)
      .select(col(v.groupCol), col(v.removedFor(dc.src)).as(dc.src),
        lit(-1L).as("n_dup"))
    pairStore.unionByName(adds).unionByName(removes)
      .groupBy(col(v.groupCol), col(dc.src))
      .agg(sum("n_dup").as("n_dup"))
      .filter(col("n_dup") > 0)
  }

  /** Attach the declared distinct-count columns to a refreshed
    * count/sum/extrema view from the (already refreshed) pair stores —
    * one view-key aggregation per distinct source over a store of
    * Σ|distinct values per group| rows, then a left join (a group can
    * exist with zero non-null source values → coalesce 0).
    */
  def withDistincts(view: DataFrame,
      pairStores: Seq[(DistAgg, DataFrame)], v: ViewSpec): DataFrame =
    pairStores.foldLeft(view) { case (acc, (dc, pairs)) =>
      val perGroup =
        if (dc.rsd.isEmpty)
          pairs.groupBy(v.groupCol).agg(count(lit(1)).as(dc.out))
        else pairs.select(col(v.groupCol),
          hll_sketch_estimate(col("sketch")).as(dc.out))
      acc.join(perGroup, Seq(v.groupCol), "left")
        .withColumn(dc.out, coalesce(col(dc.out), lit(0L)))
    }

  /** Insert-only refresh of a view DECLARING distinct counts: the core
    * count/sum/extrema fold runs unchanged (under the dist-stripped
    * spec), each pair store folds its own delta pairs, and the dist
    * outputs re-derive from the refreshed pair stores. Returns the new
    * view and the new pair stores — both must commit together (the
    * versioned-store transaction the streams/ivm8 use).
    */
  def refreshInsertOnlyDistinct(store: DataFrame,
      pairStores: Seq[(DistAgg, DataFrame)], delta: DataFrame,
      v: ViewSpec): (DataFrame, Seq[(DistAgg, DataFrame)]) = {
    require(v.dists.map(_.out).toSet == pairStores.map(_._1.out).toSet,
      s"pair stores ${pairStores.map(_._1.out)} do not match the declared " +
        s"distinct aggregates ${v.dists.map(_.out)}")
    val core = refreshInsertOnly(
      store.drop(v.dists.map(_.out): _*), delta, v.copy(dists = Nil))
    val newPairs = pairStores.map { case (dc, ps) =>
      dc -> (if (dc.rsd.isEmpty) refreshPairsInsertOnly(ps, delta, v, dc)
        else refreshSketchesInsertOnly(ps, delta, v, dc)) }
    (withDistincts(core, newPairs, v), newPairs)
  }

  /** Retraction refresh of a view DECLARING distinct counts — the CDC
    * twin of [[refreshInsertOnlyDistinct]]: core count/sums via the
    * retraction algebra, pair multiplicities via the signed value
    * deltas the changelog already carries for each tracked source
    * ([[refreshPairsWithRetractions]]). A group retracting to zero
    * membership leaves the core view; a consistent changelog retracts
    * its pairs with it, and pairs orphaned by an INCONSISTENT changelog
    * are invisible anyway (dist outputs attach by left join from the
    * view side).
    *
    * A view declaring extrema TOO (round 15, verdict #6 — previously a
    * `require` punting to manual composition) routes its core through
    * [[refreshWithRetractionsFull]], whose group-scoped recompute
    * contract demands `currentRows` — the post-changelog base state
    * carrying one [[ViewSpec.valueFor]] column per extremum source.
    * The ONE changelog serves both stores: each extremum source's
    * removed/added pair gates its recompute, each distinct source's
    * pair (the same columns when the sources coincide) drives its
    * multiplicity deltas.
    */
  def refreshWithRetractionsDistinct(store: DataFrame,
      pairStores: Seq[(DistAgg, DataFrame)], changes: DataFrame,
      v: ViewSpec, currentRows: Option[DataFrame] = None)
      : (DataFrame, Seq[(DistAgg, DataFrame)]) = {
    require(v.dists.map(_.out).toSet == pairStores.map(_._1.out).toSet,
      s"pair stores ${pairStores.map(_._1.out)} do not match the declared " +
        s"distinct aggregates ${v.dists.map(_.out)}")
    require(v.exts.isEmpty || currentRows.nonEmpty,
      "a view declaring extrema needs currentRows (the post-changelog base " +
        "state) for the group-scoped extremum recompute — " +
        "refreshWithRetractionsFull's contract")
    require(v.dists.forall(_.rsd.isEmpty),
      "a sketched distinct count cannot retract (HLL register maxima don't " +
        "invert) — declare it exact (rsd = None) for CDC views, or keep the " +
        "view insert-only (refreshInsertOnlyDistinct)")
    val stripped = v.copy(dists = Nil)
    val coreStore = store.drop(v.dists.map(_.out): _*)
    val core =
      if (v.exts.isEmpty) refreshWithRetractions(coreStore, changes, stripped)
      else refreshWithRetractionsFull(coreStore, changes, currentRows.get, stripped)
    val newPairs = pairStores.map { case (dc, ps) =>
      dc -> refreshPairsWithRetractions(ps, changes, v, dc) }
    (withDistincts(core, newPairs, v), newPairs)
  }

  /** The orders instance of [[partials]] (ivm1/ivm2/ivm3's view). */
  def orderPartials(snapshot: DataFrame): DataFrame =
    partials(snapshot, ViewSpec.Orders)

  /** Insert-only refresh: fold a delta snapshot into stored partials.
    * Both sides carry the same partial schema, so the merge is a union +
    * one keyed aggregation; SUM-of-counts, SUM-of-sums, MIN-of-mins,
    * MAX-of-maxes are each associative, so the result is independent of
    * how many increments the view has absorbed.
    */
  def refreshInsertOnly(store: DataFrame, delta: DataFrame,
      v: ViewSpec = ViewSpec.Orders): DataFrame = {
    require(v.dists.isEmpty, "declared distinct counts refresh through " +
      "the pair-store composition (refreshInsertOnlyDistinct) — per-batch " +
      "distinct counts do not merge")
    val merges = sum(v.countOut).as(v.countOut) +:
      (v.sums.map(sc => sum(sc.out).as(sc.out)) ++
        v.exts.map(e =>
          (if (e.isMin) min(e.out) else max(e.out)).as(e.out)))
    store.unionByName(partials(delta, v))
      .groupBy(v.groupCol).agg(merges.head, merges.tail: _*)
  }

  /** Join-form insert-only refresh, value-equivalent to
    * [[refreshInsertOnly]] but shaped for a BUCKETED store: a union
    * erases any physical distribution, while a full-outer join on the
    * view key lets a store bucketed on that key merge WITHOUT
    * re-shuffling its side — the delta's own partial aggregation is the
    * one exchange left when the bucket count matches the shuffle
    * partitioning (IvmSpec pins the plan; the g1b bucketed-layout
    * pattern applied to the view store). least/greatest skip nulls, so
    * store-only and delta-only keys merge without special cases.
    */
  def refreshInsertOnlyMerged(store: DataFrame, delta: DataFrame,
      v: ViewSpec = ViewSpec.Orders): DataFrame = {
    require(v.dists.isEmpty, "declared distinct counts refresh through " +
      "the pair-store composition (refreshInsertOnlyDistinct)")
    val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 4))
    val d = partials(delta, v).select(col(v.groupCol) +:
      (col(v.countOut).as(s"d_${v.countOut}") +:
        (v.sums.map(sc => col(sc.out).as(s"d_${sc.out}")) ++
          v.exts.map(e => col(e.out).as(s"d_${e.out}")))): _*)
    store.join(d, Seq(v.groupCol), "full_outer")
      .select(col(v.groupCol) +:
        ((coalesce(col(v.countOut), lit(0L)) +
          coalesce(col(s"d_${v.countOut}"), lit(0L))).as(v.countOut) +:
          (v.sums.map(sc => (coalesce(col(sc.out), zero) +
            coalesce(col(s"d_${sc.out}"), zero)).as(sc.out)) ++
            v.exts.map(e => (if (e.isMin) least(col(e.out), col(s"d_${e.out}"))
              else greatest(col(e.out), col(s"d_${e.out}"))).as(e.out)))): _*)
  }

  /** Group-valued refresh: fold signed (Δcount, Δsums) adjustments into
    * stored (count, sums) partials and drop groups that retract to zero
    * membership. `adjustments` rows carry (groupCol, dn, one delta column
    * per declared sum — the view's changelog vocabulary) with
    * dn ∈ {+1, 0, -1} per changelog op and each delta the exact decimal
    * net change that op makes to that sum.
    */
  def refreshWithRetractions(store: DataFrame, adjustments: DataFrame,
      v: ViewSpec = ViewSpec.Orders): DataFrame = {
    require(v.dists.isEmpty, "declared distinct counts refresh through " +
      "the pair-store composition (refreshWithRetractionsDistinct)")
    val storeSide = store.select(col(v.groupCol) +:
      (col(v.countOut).as(v.dn) +: v.sums.map(sc => col(sc.out).as(sc.delta))): _*)
    val adjSide = adjustments.select(col(v.groupCol) +:
      (col(v.dn) +: v.sums.map(sc => col(sc.delta))): _*)
    storeSide.unionByName(adjSide)
      .groupBy(v.groupCol)
      .agg(sum(v.dn).as(v.countOut), v.sums.map(sc => sum(sc.delta).as(sc.out)): _*)
      .filter(col(v.countOut) > 0)
  }

  /** Which groups need a MIN/MAX recompute under this changelog: exactly
    * those where some REMOVED value (a delete, or an update's old value)
    * reaches a stored extremum — or where a removal hits a group the
    * STORE has never seen (a group born and retracted within one
    * changelog: the merge's least(null, added) would count the removed
    * value as if it survived, so store-absent + any removal ⇒
    * recompute). Everywhere else the stored extremum row provably
    * survives with its value intact, so the new extremum is the pure
    * merge least(stored, added)/greatest(stored, added) — no base read.
    * The ≤/≥ comparisons (not =) keep the gate sound even against an
    * inconsistent changelog claiming to remove a value below the stored
    * min: recompute rather than trust it. One group-keyed aggregation
    * over the changelog joined to the view-sized store.
    */
  def extremumTouchedGroups(store: DataFrame, valueChanges: DataFrame,
      v: ViewSpec = ViewSpec.Orders): DataFrame = {
    require(v.exts.nonEmpty, "extremum gate on a view with no min/max")
    val sPrefixed = store.select(col(v.groupCol) +:
      v.exts.map(e => col(e.out).as(s"s_${e.out}")): _*)
    // per-SOURCE removal column: each extremum is gated on removals of
    // ITS OWN value population (multi-source views carry one
    // removed/added pair per source — ViewSpec.removedFor's naming)
    val hits = v.exts.map { e =>
      val rem = col(v.removedFor(e.src))
      val reaches =
        if (e.isMin) rem <= col(s"s_${e.out}")
        else rem >= col(s"s_${e.out}")
      max(when(rem.isNotNull &&
        (col(s"s_${e.out}").isNull || reaches), 1)
        .otherwise(0)).as(s"hit_${e.out}")
    }
    valueChanges
      .join(sPrefixed, Seq(v.groupCol), "left")
      .groupBy(v.groupCol).agg(hits.head, hits.tail: _*)
      .filter(v.exts.map(e => col(s"hit_${e.out}") === 1).reduce(_ || _))
      .select(v.groupCol)
  }

  /** Full-state refresh under a general changelog, MIN/MAX INCLUDED —
    * the classical fix for "min/max are not invertible under deletes"
    * (the reason ivm2's view deliberately excludes them): keep the merge
    * algebra for count/sums and for every group whose extremum survives,
    * and fall back to a GROUP-SCOPED recompute only where a retraction
    * actually removed a stored extremum.
    *
    * `valueChanges` rows are one per changelog op, in the view's declared
    * changelog vocabulary: (groupCol, dn, sum deltas, then one
    * removed/added pair PER extremum source — [[ViewSpec.removedFor]]) —
    * insert (+1, +p, null, p), update (0, Δsum, old, new — or null/null
    * when the update leaves that extremum source untouched), delete
    * (−1, −p, p, null), each pair tracking its own source's population.
    * `currentRows` is the post-changelog base state (groupCol, one
    * [[ViewSpec.valueFor]] column per extremum source) —
    * it is read ONLY through a left-semi join on
    * [[extremumTouchedGroups]], so untouched groups never re-read the
    * base (IvmSpec pins both the semi-join in the plan and that a
    * no-extremum changelog touches zero groups); at deployment the base
    * buckets by the view key and the recompute reads just the touched
    * groups' buckets.
    *
    * Cost shape: everything except the recompute branch is view-sized or
    * changelog-sized; the recompute is Σ|touched groups' rows| — under a
    * uniform changelog that is ~|deletes hitting extrema| × avg group
    * size, a sliver of the fact table, vs ivm2's alternative of a FULL
    * recompute whenever a deployment needs MIN/MAX under CDC.
    */
  def refreshWithRetractionsFull(store: DataFrame, valueChanges: DataFrame,
      currentRows: DataFrame, v: ViewSpec = ViewSpec.Orders): DataFrame = {
    val cs = refreshWithRetractions(
      store.select(col(v.groupCol) +:
        (col(v.countOut) +: v.sums.map(sc => col(sc.out))): _*),
      valueChanges.select(col(v.groupCol) +:
        (col(v.dn) +: v.sums.map(sc => col(sc.delta))): _*), v)
    val touched = extremumTouchedGroups(store, valueChanges, v)
    // per-source added/value columns (ViewSpec.addedFor/valueFor): each
    // extremum merges additions to and recomputes from its OWN population
    val addAggs = v.exts.map(e =>
      (if (e.isMin) min(col(v.addedFor(e.src)))
       else max(col(v.addedFor(e.src)))).as(s"add_${e.out}"))
    val adds = valueChanges.groupBy(v.groupCol).agg(addAggs.head, addAggs.tail: _*)
    val recAggs = v.exts.map(e =>
      (if (e.isMin) min(col(v.valueFor(e.src)))
       else max(col(v.valueFor(e.src)))).as(s"r_${e.out}"))
    val rec = currentRows.join(touched, Seq(v.groupCol), "left_semi")
      .groupBy(v.groupCol).agg(recAggs.head, recAggs.tail: _*)
    cs // survivors only: groups retracted to zero already dropped here
      .join(store.select(col(v.groupCol) +:
        v.exts.map(e => col(e.out).as(s"s_${e.out}")): _*),
        Seq(v.groupCol), "left")
      .join(adds, Seq(v.groupCol), "left")
      .join(rec, Seq(v.groupCol), "left")
      // rec has a row ⇔ the group was touched (semi-join is on touched):
      // touched groups take the exact recompute, everyone else the merge
      .select(col(v.groupCol) +:
        (col(v.countOut) +: (v.sums.map(sc => col(sc.out)) ++
          v.exts.map { e =>
            val merge = if (e.isMin) least(col(s"s_${e.out}"), col(s"add_${e.out}"))
              else greatest(col(s"s_${e.out}"), col(s"add_${e.out}"))
            when(col(s"r_${e.out}").isNotNull, col(s"r_${e.out}"))
              .otherwise(merge).as(e.out)
          })): _*)
  }

  /** `orders` with the broadcast median-key cut column attached — the
    * one spelling of the dd9-style in-plan split every ivm query's
    * base/delta/changelog derivation starts from.
    */
  private def ordersWithCut(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    orders.crossJoin(
      broadcast(orders.agg(expr("(max(o_orderkey) + 1) div 2").as("cut"))))
  }

  /** Split `orders` at the median key into (base, delta) — the same
    * in-plan broadcast-scalar cut as dd9, so one query works at every SF.
    */
  private def splitAtCut(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val withCut = ordersWithCut(s, dir)
    (withCut.filter(col("o_orderkey") < col("cut")),
      withCut.filter(col("o_orderkey") >= col("cut")))
  }

  private def ivm1(s: SparkSession, dir: String): DataFrame =
    ivm1At(s, dir, ScratchDirs.keyed("ivm1_view", dir))

  /** ivm1 with an explicit store path — IvmSpec drives the identical
    * dataflow against a private dir so it never overwrites the shared
    * scratch store mid-read under parallel suites (EntrySpec and
    * ShuffleBudgetSpec both execute the query surface).
    */
  def ivm1At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val (base, delta) = splitAtCut(s, dir)
    orderPartials(base).write.mode("overwrite").parquet(storeDir)
    refreshInsertOnly(s.read.parquet(storeDir), delta)
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"),
        col("min_price"), col("max_price"))
      .orderBy("o_custkey")
  }

  /** Per-nation mergeable partials over one fact snapshot JOINED to the
    * customer dimension — the ivm4 building block. The general bilinear
    * delta rule for a join view is ΔV = γ(ΔA⋈B) ∪ γ(A⋈ΔB) ∪ γ(ΔA⋈ΔB);
    * the star-schema case implemented here (static dimension, insert-only
    * fact — the overwhelmingly common 100 TB shape) collapses it to the
    * first term: aggregate ONLY Δfact⋈dim and merge. The dim side is
    * broadcast — the delta join never shuffles the dimension.
    */
  def joinPartials(factSnapshot: DataFrame, customer: DataFrame): DataFrame =
    factSnapshot.join(
      broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
      col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"))

  /** ivm4 with an explicit store path (see [[ivm1At]]): maintain the
    * per-nation join view from an insert-only fact delta without
    * re-joining or re-aggregating the base fact.
    */
  def ivm4At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val (base, delta) = splitAtCut(s, dir)
    val customer = Tables(s, dir, "customer")
    joinPartials(base, customer).write.mode("overwrite").parquet(storeDir)
    s.read.parquet(storeDir)
      .unionByName(joinPartials(delta, customer))
      .groupBy("c_nationkey").agg(
        sum("n_orders").as("n_orders"),
        sum("sum_dec").as("sum_dec"))
      .select(col("c_nationkey"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"))
      .orderBy("c_nationkey")
  }

  private def ivm4(s: SparkSession, dir: String): DataFrame =
    ivm4At(s, dir, ScratchDirs.keyed("ivm4_view", dir))

  /** Exact decimal +100.0000 — the ivm2 changelog's update semantics
    * (`price := price + 100`). Literal BigDecimal, not a double: the
    * adjustment must live entirely in decimal space for the retraction
    * arithmetic to be exact on both engines.
    */
  private val UpdateBump = lit(new java.math.BigDecimal("100.0000")).cast(D)

  private def ivm2(s: SparkSession, dir: String): DataFrame =
    ivm2At(s, dir, ScratchDirs.keyed("ivm2_view", dir))

  /** The deterministic CDC changelog against the base snapshot, in ONE
    * spelling (ivm2 consumes the (dn, ds) algebra columns, ivm2b
    * additionally the value-level (v_removed, v_added) — sharing the
    * builder is what keeps the two queries describing the same CDC feed,
    * which their scaladocs and oracles both assume): the delta keys are
    * inserts; base keys ≡3 (mod 7) take a +100 price update; base keys
    * ≡5 (mod 13) not already updated are deletes. Each row maps to at
    * most ONE op, so the changelog derives in a single scan (a
    * three-branch union would re-scan the fact per op type); no-op base
    * rows drop out on the null dn. (dn, ds) is the op's group-algebra
    * contribution, ds cast to the store's SUM-widened DECIMAL(28,4) so
    * the retraction union is loss-free; the value columns stay in
    * DOUBLE (+100.0 is one correctly-rounded IEEE add, identical on
    * both engines) — min/max live in double space, only the sum algebra
    * in decimal.
    */
  private def cdcChangelog(s: SparkSession, dir: String): DataFrame = {
    val p = col("o_totalprice").cast(D)
    val v = col("o_totalprice")
    val k = col("o_orderkey")
    ordersWithCut(s, dir)
      .select(col("o_custkey"),
        when(k >= col("cut"), lit(1L))                          // insert
          .when(k % 7 === 3, lit(0L))                           // update
          .when(k % 13 === 5, lit(-1L))                         // delete
          .as("dn"),
        when(k >= col("cut"), p)
          .when(k % 7 === 3, UpdateBump)
          .when(k % 13 === 5, -p)
          .cast(DecimalType(28, 4)).as("ds"),
        when(k >= col("cut"), lit(null).cast("double"))
          .when(k % 7 === 3, v)                                 // old value out
          .when(k % 13 === 5, v)
          .as("v_removed"),
        when(k >= col("cut"), v)
          .when(k % 7 === 3, v + lit(100.0))                    // new value in
          .when(k % 13 === 5, lit(null).cast("double"))
          .as("v_added"))
      .filter(col("dn").isNotNull)
  }

  /** ivm2 with an explicit store path (see [[ivm1At]]). */
  def ivm2At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val (base, _) = splitAtCut(s, dir)
    base.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast(D)).as("sum_dec"))
      .write.mode("overwrite").parquet(storeDir)
    refreshWithRetractions(s.read.parquet(storeDir),
      cdcChangelog(s, dir).select("o_custkey", "dn", "ds"))
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"))
      .orderBy("o_custkey")
  }

  /** ivm3/ivm3b's registered-view store dir — PROCESS-unique on purpose:
    * [[graft.plans.MvRegistry.register]] pins the view's file listing at
    * registration, and `ScratchDirs.keyed` alone is shared across
    * processes for the same (user, source dir), so a second driver
    * process rebuilding the view with mode("overwrite") would delete the
    * files a live session's pinned LogicalRelation still references
    * (FAILED_READ_FILE, or a stale rewritten answer). One dir per pid
    * keeps each process's registration self-owned; in-process rebuild
    * safety stays with the unregister→rebuild→register protocol below.
    * The dir is view-sized (group cardinality) and reused across runs of
    * the same process; DEAD processes' dirs are reclaimed best-effort on
    * each rebuild (pid liveness via ProcessHandle — pid reuse errs
    * toward KEEPING a dir, never deleting a live writer's), so the
    * per-pid fan-out stays bounded across runs too, the reclamation
    * path the versioned stores get from pruneStoreVersions.
    */
  private def ivm3StoreDir(s: SparkSession, dir: String,
      tag: String = "ivm3_view"): String = {
    val ownPid = ProcessHandle.current().pid()
    val own = ScratchDirs.keyed(s"${tag}_p$ownPid", dir)
    val ownFile = new java.io.File(own)
    val digest = ownFile.getName.substring(ownFile.getName.lastIndexOf('_') + 1)
    val pat = s"^${tag}_p(\\d+)_([0-9a-f]{32})$$".r
    Option(ownFile.getParentFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case pat(pid, dg) if dg == digest && pid.toLong != ownPid &&
            !ProcessHandle.of(pid.toLong)
              .map[java.lang.Boolean](_.isAlive).orElse(java.lang.Boolean.FALSE) =>
          try graft.etl.StoreFs.deleteRecursive(
            graft.etl.StoreFs.fs(s, f.getAbsolutePath), f.getAbsolutePath)
          catch { case _: java.io.IOException => () } // best-effort
        case _ => ()
      }
    }
    own
  }

  /** The MV refresh protocol in ONE spelling (ivm3/ivm3b/ivm3c all run
    * it): unregister → rebuild the full-table partial store → re-
    * register. The unregister window is load-bearing — left registered,
    * the partial-build aggregate below IS the registered shape and would
    * be rewritten to scan the very store the write is overwriting
    * (observed as FAILED_READ_FILE mid-write); readers keep planning
    * against the base until the fresh view re-registers, exactly the
    * production MV-refresh posture.
    */
  private def rebuildAndRegister(s: SparkSession, dir: String): Unit =
    rebuildAndRegisterView(s, dir, "orders", ViewSpec.Orders, "ivm3_view")

  /** The same unregister→rebuild→register protocol for ANY declared
    * view — the generic path [[rebuildAndRegister]] instantiates.
    */
  private def rebuildAndRegisterView(s: SparkSession, dir: String,
      table: String, v: ViewSpec, tag: String): Unit = {
    val basePath = s"$dir/$table.parquet"
    graft.plans.MvRegistry.unregister(basePath)
    val storeDir = ivm3StoreDir(s, dir, tag)
    partials(Tables(s, dir, table), v).write.mode("overwrite").parquet(storeDir)
    graft.plans.MvRegistry.register(s, basePath, storeDir, v)
  }

  private def ivm2b(s: SparkSession, dir: String): DataFrame =
    ivm2bAt(s, dir, ScratchDirs.keyed("ivm2b_view", dir))

  /** ivm2b: the ivm2 changelog maintained over the FULL view — min/max
    * included via [[refreshWithRetractionsFull]]'s group-scoped
    * recompute. The changelog reuses ivm2's op assignment (inserts =
    * delta half, updates = keys ≡3 mod 7 at +100, deletes = keys ≡5 mod
    * 13 not updated) extended with the value-level removed/added columns
    * min/max maintenance needs; the deletes statistically hit many group
    * minima (1/13 of base rows), which is exactly the regime the
    * recompute gate exists for. Value arithmetic for min/max stays in
    * DOUBLE (+100.0 is one correctly-rounded IEEE add, identical on both
    * engines); only the sum algebra runs in decimal.
    */
  def ivm2bAt(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val (base, _) = splitAtCut(s, dir)
    orderPartials(base).write.mode("overwrite").parquet(storeDir)

    // post-changelog base truth, derived in ONE scan (insert / update /
    // delete / untouched branches mirror cdcChangelog's exactly); read
    // only through the touched-group semi-join inside the refresh
    val v = col("o_totalprice")
    val k = col("o_orderkey")
    val currentRows = ordersWithCut(s, dir)
      .select(col("o_custkey"),
        when(k >= col("cut"), v)
          .when(k % 7 === 3, v + lit(100.0))
          .when(k % 13 === 5, lit(null).cast("double"))
          .otherwise(v).as("v"))
      .filter(col("v").isNotNull)

    refreshWithRetractionsFull(s.read.parquet(storeDir),
      cdcChangelog(s, dir), currentRows)
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"),
        col("min_price"), col("max_price"))
      .orderBy("o_custkey")
  }

  /** Build + register the full-table partial view, then run the base
    * aggregate VERBATIM — [[graft.plans.MvRewriteRule]] must substitute
    * the view scan at analysis time (MvRewriteSpec pins the plan; here
    * the driver's oracle pins that the substituted answer is the right
    * one). Registration precedes construction because Datasets analyze
    * eagerly. The registration intentionally survives this query
    * (registering a view IS the session-level opt-in, like every MV
    * system's): it is harmless to the rest of the suite because the
    * matcher fires only on partial-aggregate shapes over the registered
    * path — the exact unfiltered shape, its group-key-filtered variants
    * (ivm3c), and the global rollup — and harmlessness rests on the view
    * being rebuilt FRESH here immediately before registration, so even an
    * accidental later match answers from current data.
    */
  private def ivm3(s: SparkSession, dir: String): DataFrame = {
    rebuildAndRegister(s, dir)
    Tables(s, dir, "orders")
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"),
        col("min_price"), col("max_price"))
      .orderBy("o_custkey")
  }

  /** ivm3g: the AVG read answered from count+sum partials (round-14
    * #8) — `avg(cast(o_totalprice as DECIMAL(18,4)))` routes through
    * the MV rewrite as the view's sum/count division (Spark's own
    * Average.evaluateExpression with the store attributes spliced in,
    * so scale/rounding semantics are Spark-identical; MvRewriteSpec
    * pins plan + exact values). Emission is the two-stage decimal
    * HALF_UP Spark's avg defines — the scale-8 quotient re-rounded to
    * scale 4 — NOT a round on the double: quotients land EXACTLY on the
    * half grid (n=8 orders sum to a .5 at scale 5 three times at
    * sf0.01), where decimal HALF_UP and binary-double rounding disagree
    * by one quantum. The oracle replicates both stages in exact HUGEINT
    * arithmetic (the ⌊(2a+b)/2b⌋ half-up form), so the grids coincide
    * by construction.
    */
  private def ivm3g(s: SparkSession, dir: String): DataFrame = {
    rebuildAndRegister(s, dir)
    Tables(s, dir, "orders")
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        avg(col("o_totalprice").cast(D)).as("avg_dec"))
      .select(col("o_custkey"), col("n_orders"),
        col("avg_dec").cast(DecimalType(22, 4)).cast("double").as("avg_price"))
      .orderBy("o_custkey")
  }

  /** The most common warehouse read against a maintained view: a filter
    * on the VIEW'S OWN GROUP KEY above the base scan. The predicate is
    * constant within each group, so it commutes with the grouping and
    * [[graft.plans.MvRewriteRule]] answers it from the store by pushing
    * the predicate onto the substituted view scan — the fact table is
    * never touched (MvRewriteSpec pins the plan; the oracle pins the
    * answer against a full filtered recompute).
    */
  private def ivm3c(s: SparkSession, dir: String): DataFrame = {
    rebuildAndRegister(s, dir)
    Tables(s, dir, "orders")
      .filter(col("o_custkey") % 5 === 2)
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .select(col("o_custkey"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"),
        col("min_price"), col("max_price"))
      .orderBy("o_custkey")
  }

  /** The banded rollup: `GROUP BY o_custkey % 10` is a deterministic
    * function of the view key, so [[graft.plans.MvRewriteRule]] answers
    * it by re-aggregating the store's per-key partials by the band —
    * ten result rows from a group-cardinality-sized scan, the fact
    * never touched (MvRewriteSpec pins the plan).
    */
  private def ivm3e(s: SparkSession, dir: String): DataFrame = {
    rebuildAndRegister(s, dir)
    Tables(s, dir, "orders")
      .groupBy((col("o_custkey") % 10).as("cust_band")).agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .select(col("cust_band"), col("n_orders"),
        col("sum_dec").cast("double").as("sum_price"),
        col("min_price"), col("max_price"))
      .orderBy("cust_band")
  }

  private def ivm5(s: SparkSession, dir: String): DataFrame =
    ivm5At(s, dir, ScratchDirs.keyed("ivm5_view", dir))

  /** ivm5: the SECOND declared view (verdict r11 #4's "done" gate) —
    * lineitem by l_partkey with count / exact-decimal quantity sum /
    * min extended price ([[ViewSpec.PartItems]]), maintained under a
    * full CDC changelog through the IDENTICAL generic functions the
    * orders view runs: [[partials]], [[refreshWithRetractions]],
    * [[extremumTouchedGroups]], [[refreshWithRetractionsFull]]. A new
    * view is now this declaration plus its changelog derivation — zero
    * copied operator code.
    *
    * The changelog mirrors ivm2b's op assignment on the ORDER key (all
    * lines of an order share one op): inserts = the delta half; updates
    * (keys ≡3 mod 7) bump quantity by 1 — a sum delta that leaves the
    * extremum source untouched, exercising the null removed/added
    * update branch the orders changelog never hits; deletes = keys ≡5
    * mod 13 not updated, whose removed extended price statistically
    * reaches many per-part minima — the recompute-gate regime.
    */
  def ivm5At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val v = ViewSpec.PartItems
    val li = Tables(s, dir, "lineitem")
    val withCut = li.crossJoin(
      broadcast(li.agg(expr("(max(l_orderkey) + 1) div 2").as("cut"))))
    partials(withCut.filter(col("l_orderkey") < col("cut")), v)
      .write.mode("overwrite").parquet(storeDir)
    val k = col("l_orderkey")
    val q = col("l_quantity").cast(D)
    val ep = col("l_extendedprice")
    val changes = withCut.select(col("l_partkey"),
      when(k >= col("cut"), lit(1L))                          // insert
        .when(k % 7 === 3, lit(0L))                           // update
        .when(k % 13 === 5, lit(-1L))                         // delete
        .as("dn"),
      when(k >= col("cut"), q)
        .when(k % 7 === 3, lit(new java.math.BigDecimal("1.0000")).cast(D))
        .when(k % 13 === 5, -q)
        .cast(DecimalType(28, 4)).as("ds"),
      // the quantity update never touches the extremum source, so it
      // removes/adds NO extended-price value (both null)
      when(k < col("cut") && k % 7 =!= 3 && k % 13 === 5, ep).as("v_removed"),
      when(k >= col("cut"), ep).as("v_added"))
      .filter(col("dn").isNotNull)
    // post-changelog truth for the extremum source, read only through
    // the touched-group semi-join inside the refresh
    val currentRows = withCut
      .filter(!(k < col("cut") && k % 13 === 5 && k % 7 =!= 3))
      .select(col("l_partkey"), ep.as("v"))
    refreshWithRetractionsFull(s.read.parquet(storeDir), changes,
      currentRows, v)
      .select(col("l_partkey"), col("n_items"),
        col("sum_qty").cast("double").as("sum_qty"), col("min_eprice"))
      .orderBy("l_partkey")
  }

  private def ivm6(s: SparkSession, dir: String): DataFrame =
    ivm6At(s, dir, ScratchDirs.keyed("ivm6_view", dir))

  /** ivm6: the TWO-SOURCE-extrema view (round-13 #4's "done" gate) —
    * lineitem by l_suppkey with count / exact quantity sum /
    * `min(l_quantity)` / `max(l_extendedprice)` ([[ViewSpec.LineStats]]),
    * maintained under a full CDC changelog through the SAME generic
    * functions every other view runs. The changelog carries one
    * removed/added pair PER source: the quantity update (keys ≡3 mod 7,
    * +1) REPLACES a quantity value (removed=q, added=q+1) while leaving
    * the extended-price population untouched (null pair) — so one op
    * can trip the min_qty recompute gate while max_eprice merges, the
    * cross-source independence the lifted restriction must preserve.
    * Deletes (keys ≡5 mod 13 not updated) remove BOTH sources' values.
    */
  def ivm6At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val v = ViewSpec.LineStats
    val li = Tables(s, dir, "lineitem")
    val withCut = li.crossJoin(
      broadcast(li.agg(expr("(max(l_orderkey) + 1) div 2").as("cut"))))
    partials(withCut.filter(col("l_orderkey") < col("cut")), v)
      .write.mode("overwrite").parquet(storeDir)
    val k = col("l_orderkey")
    val q = col("l_quantity")
    val qd = q.cast(D)
    val ep = col("l_extendedprice")
    val changes = withCut.select(col("l_suppkey"),
      when(k >= col("cut"), lit(1L))                          // insert
        .when(k % 7 === 3, lit(0L))                           // update
        .when(k % 13 === 5, lit(-1L))                         // delete
        .as("dn"),
      when(k >= col("cut"), qd)
        .when(k % 7 === 3, lit(new java.math.BigDecimal("1.0000")).cast(D))
        .when(k % 13 === 5, -qd)
        .cast(DecimalType(28, 4)).as("ds"),
      // quantity population: the update REPLACES q with q+1; the
      // delete removes q; the insert adds q
      when(k < col("cut") && (k % 7 === 3 || k % 13 === 5), q)
        .as(v.removedFor("l_quantity")),
      when(k >= col("cut"), q)
        .when(k % 7 === 3, q + lit(1.0))
        .as(v.addedFor("l_quantity")),
      // extended-price population: the quantity update leaves it
      // untouched (null/null) — only inserts/deletes move it
      when(k < col("cut") && k % 7 =!= 3 && k % 13 === 5, ep)
        .as(v.removedFor("l_extendedprice")),
      when(k >= col("cut"), ep).as(v.addedFor("l_extendedprice")))
      .filter(col("dn").isNotNull)
    // post-changelog truth for BOTH extremum sources, read only through
    // the touched-group semi-join inside the refresh
    val currentRows = withCut
      .filter(!(k < col("cut") && k % 13 === 5 && k % 7 =!= 3))
      .select(col("l_suppkey"),
        when(k < col("cut") && k % 7 === 3, q + lit(1.0)).otherwise(q)
          .as(v.valueFor("l_quantity")),
        ep.as(v.valueFor("l_extendedprice")))
    refreshWithRetractionsFull(s.read.parquet(storeDir), changes,
      currentRows, v)
      .select(col("l_suppkey"), col("n_lines"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("min_qty"), col("max_eprice"))
      .orderBy("l_suppkey")
  }

  private def ivm7(s: SparkSession, dir: String): DataFrame =
    ivm7At(s, dir, ScratchDirs.keyed("ivm7_view", dir))

  /** ivm7: the events-vocabulary view (round-13 #6) — per-user activity
    * stats over the NON-warehouse events feed ([[ViewSpec.Events]]),
    * split at the median event id and folded through the insert-only
    * refresh: the append-only regime an activity feed actually runs
    * (events are immutable facts; the streaming twin is
    * IvmStreamSpec's events case over the SAME spec).
    */
  def ivm7At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val v = ViewSpec.Events
    val ev = Tables(s, dir, "events")
    val withCut = ev.crossJoin(
      broadcast(ev.agg(expr("(max(event_id) + 1) div 2").as("cut"))))
    partials(withCut.filter(col("event_id") < col("cut")), v)
      .write.mode("overwrite").parquet(storeDir)
    refreshInsertOnly(s.read.parquet(storeDir),
      withCut.filter(col("event_id") >= col("cut")), v)
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))
      .orderBy("user_id")
  }

  private def ivm8(s: SparkSession, dir: String): DataFrame =
    ivm8At(s, dir, ScratchDirs.keyed("ivm8_view", dir))

  /** ivm8: the DISTINCT-COUNT vocabulary (round-14 #5) — per-supplier
    * line count, exact quantity sum, and `count(DISTINCT l_partkey)`
    * ([[ViewSpec.SupplierParts]]) maintained EXACTLY under a full
    * insert/update/delete changelog via the keyed pair store: per
    * (suppkey, partkey) multiplicities fold the changelog's signed
    * value deltas (the same removed/added columns the extremum gate
    * reads), pairs retracting to zero leave the store, and the view's
    * distinct count is the per-group surviving-pair count
    * ([[refreshWithRetractionsDistinct]]). The changelog mirrors ivm5's
    * op assignment on the order key: inserts = the second half; updates
    * (keys ≡3 mod 7) bump quantity — touching the sum but NOT the
    * partkey population (null value pair, the no-op branch); deletes
    * (keys ≡5 mod 13 not updated) retract quantity AND the line's
    * partkey multiplicity — only a supplier losing its LAST line of a
    * part loses a distinct part.
    */
  def ivm8At(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val v = ViewSpec.SupplierParts
    val dc = v.dists.head
    val li = Tables(s, dir, "lineitem")
    val withCut = li.crossJoin(
      broadcast(li.agg(expr("(max(l_orderkey) + 1) div 2").as("cut"))))
    val seed = withCut.filter(col("l_orderkey") < col("cut"))
    partials(seed, v).write.mode("overwrite").parquet(storeDir)
    pairPartials(seed, v, dc)
      .write.mode("overwrite").parquet(s"${storeDir}_pairs")
    val k = col("l_orderkey")
    val q = col("l_quantity").cast(D)
    val changes = withCut.select(col("l_suppkey"),
      when(k >= col("cut"), lit(1L))                          // insert
        .when(k % 7 === 3, lit(0L))                           // update
        .when(k % 13 === 5, lit(-1L))                         // delete
        .as("dn"),
      when(k >= col("cut"), q)
        .when(k % 7 === 3, lit(new java.math.BigDecimal("1.0000")).cast(D))
        .when(k % 13 === 5, -q)
        .cast(DecimalType(28, 4)).as("ds"),
      // partkey population: the quantity update leaves it untouched
      when(k < col("cut") && k % 7 =!= 3 && k % 13 === 5, col("l_partkey"))
        .as(v.removedFor(dc.src)),
      when(k >= col("cut"), col("l_partkey")).as(v.addedFor(dc.src)))
      .filter(col("dn").isNotNull)
    val (view, _) = refreshWithRetractionsDistinct(
      s.read.parquet(storeDir),
      Seq(dc -> s.read.parquet(s"${storeDir}_pairs")), changes, v)
    view.select(col("l_suppkey"), col("n_lines"),
      col("sum_qty").cast("double").as("sum_qty"), col("n_parts"))
      .orderBy("l_suppkey")
  }

  /** ivm8b: the distinct-count READ routed through the MV rewrite — a
    * per-supplier `count(DISTINCT l_partkey)` over lineitem answers
    * from the registered SupplierParts store's n_parts column
    * (MvRewriteSpec pins the plan; this query pins the values against
    * the full recompute). Distinct counts route on the KEYED read only:
    * they do not re-aggregate, so regrouped/global reads correctly
    * disqualify (also spec-pinned).
    */
  private def ivm8b(s: SparkSession, dir: String): DataFrame = {
    rebuildAndRegisterView(s, dir, "lineitem", ViewSpec.SupplierParts,
      "ivm8b_view")
    Tables(s, dir, "lineitem")
      .groupBy("l_suppkey").agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(D)).as("sum_dec_q"),
        count_distinct(col("l_partkey")).as("n_parts"))
      .select(col("l_suppkey"), col("n_lines"),
        col("sum_dec_q").cast("double").as("sum_qty"), col("n_parts"))
      .orderBy("l_suppkey")
  }

  private def ivm8c(s: SparkSession, dir: String): DataFrame =
    ivm8cAt(s, dir, ScratchDirs.keyed("ivm8c_view", dir))

  /** ivm8c: the SKETCHED distinct-count vocabulary (round-15 #8) —
    * [[ViewSpec.SupplierPartsApprox]] maintained insert-only: the seed
    * half's per-supplier HLL sketches fold the delta half's through the
    * associative HLL union ([[refreshSketchesInsertOnly]]), and the
    * view's n_parts re-derives from the refreshed sketch store. Store
    * size is |suppliers| × sketch bytes — independent of partkey
    * cardinality, the bound the exact pair store can't give at 100 TB.
    * Bounded-oracle emission (the a2c form): sketch estimates aren't
    * portable across engines, so the query emits the EXACT distinct
    * twin (oracled bit-for-bit) plus a flag asserting the sketch landed
    * within 5% of it (declared rsd 2%); the oracle states the flag as
    * literal 1.
    */
  def ivm8cAt(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val v = ViewSpec.SupplierPartsApprox
    val dc = v.dists.head
    val li = Tables(s, dir, "lineitem")
    val withCut = li.crossJoin(
      broadcast(li.agg(expr("(max(l_orderkey) + 1) div 2").as("cut"))))
    val seed = withCut.filter(col("l_orderkey") < col("cut"))
    val delta = withCut.filter(col("l_orderkey") >= col("cut"))
    partials(seed, v).write.mode("overwrite").parquet(storeDir)
    distPartials(seed, v, dc)
      .write.mode("overwrite").parquet(s"${storeDir}_sk")
    val (view, _) = refreshInsertOnlyDistinct(
      s.read.parquet(storeDir),
      Seq(dc -> s.read.parquet(s"${storeDir}_sk")), delta, v)
    val exact = li.groupBy("l_suppkey")
      .agg(count_distinct(col("l_partkey")).as("n_parts_exact"))
    view.join(exact, Seq("l_suppkey"), "left")
      .select(col("l_suppkey"), col("n_lines"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("n_parts_exact"),
        when(abs(col(dc.out) - col("n_parts_exact"))
          <= col("n_parts_exact") * 0.05, lit(1)).otherwise(lit(0))
          .as("hll_within_5pct"))
      .orderBy("l_suppkey")
  }

  /** ivm3d: MULTI-VIEW routing + an IN-list group-key read (verdict r11
    * #7) — with BOTH the orders view and the lineitem view registered,
    * a partkey-IN-list aggregate over lineitem must route to the
    * lineitem store (the registry keys rewrites by base path, so the
    * orders registration can never capture it — MvRewriteSpec pins the
    * scanned store) with the IN predicate pushed onto the view scan.
    */
  private def ivm3d(s: SparkSession, dir: String): DataFrame = {
    rebuildAndRegister(s, dir) // the orders view stays registered too
    rebuildAndRegisterView(s, dir, "lineitem", ViewSpec.PartItems, "ivm3d_view")
    Tables(s, dir, "lineitem")
      .filter(col("l_partkey").isin(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L))
      .groupBy("l_partkey").agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(D)).as("sum_dec_q"),
        min(col("l_extendedprice")).as("min_eprice"))
      .select(col("l_partkey"), col("n_items"),
        col("sum_dec_q").cast("double").as("sum_qty"), col("min_eprice"))
      .orderBy("l_partkey")
  }

  val qs: Seq[Q] = Seq(
    // IVM, insert-only delta: the refreshed view must equal a full
    // recompute over the whole table — the oracle IS the full recompute.
    Q("ivm1_delta_agg", Some(
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      ivm1),

    // IVM, general changelog (insert/update/delete via retractions): the
    // oracle applies the same changelog semantics DIRECTLY to the rows
    // (update = +100.0000 in decimal, delete = row removed) and fully
    // recomputes — the incremental group arithmetic must land on the
    // identical exact sums.
    Q("ivm2_cdc_agg", Some(
      """WITH cutv AS (SELECT (max(o_orderkey) + 1) // 2 AS cut FROM orders),
        |survivors AS (
        |  SELECT o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,4)) +
        |      CASE WHEN o_orderkey % 7 = 3 THEN CAST(100.0000 AS DECIMAL(18,4))
        |           ELSE CAST(0 AS DECIMAL(18,4)) END AS p
        |  FROM orders, cutv
        |  WHERE o_orderkey < cut
        |    AND NOT (o_orderkey % 13 = 5 AND o_orderkey % 7 <> 3)),
        |ins AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,4)) AS p
        |  FROM orders, cutv WHERE o_orderkey >= cut),
        |final AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins)
        |SELECT o_custkey, count(*) AS n_orders, CAST(sum(p) AS DOUBLE) AS sum_price
        |FROM final GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      ivm2),

    // Retraction-safe MIN/MAX: the ivm2 changelog maintained over the
    // full view — groups whose extremum was removed recompute from just
    // their own rows, everyone else merges. The oracle applies the same
    // changelog row-level and fully recomputes all four aggregates; the
    // refreshed view must be indistinguishable, min/max included.
    Q("ivm2b_cdc_minmax", Some(
      """WITH cutv AS (SELECT (max(o_orderkey) + 1) // 2 AS cut FROM orders),
        |survivors AS (
        |  SELECT o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,4)) +
        |      CASE WHEN o_orderkey % 7 = 3 THEN CAST(100.0000 AS DECIMAL(18,4))
        |           ELSE CAST(0 AS DECIMAL(18,4)) END AS p,
        |    CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 100.0
        |         ELSE o_totalprice END AS v
        |  FROM orders, cutv
        |  WHERE o_orderkey < cut
        |    AND NOT (o_orderkey % 13 = 5 AND o_orderkey % 7 <> 3)),
        |ins AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,4)) AS p,
        |         o_totalprice AS v
        |  FROM orders, cutv WHERE o_orderkey >= cut),
        |final AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins)
        |SELECT o_custkey, count(*) AS n_orders, CAST(sum(p) AS DOUBLE) AS sum_price,
        |  min(v) AS min_price, max(v) AS max_price
        |FROM final GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      ivm2b),

    // Materialized-view rewrite under the oracle gate: the query Spark
    // executes is the VIEW substitution (MvRewriteSpec pins the plan
    // scans the partial store, not orders), and the oracle is the full
    // recompute it must be indistinguishable from.
    Q("ivm3_mv_rewrite", Some(
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      ivm3),

    // The GLOBAL rollup answered from the same registered view: the
    // rewrite re-aggregates partials (count -> sum of counts, sum -> sum
    // of sums) instead of touching the fact. Shares ivm3's registration
    // (both run the unregister->rebuild->register protocol).
    Q("ivm3b_mv_rollup", Some(
      """SELECT count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders""".stripMargin),
      (s, dir) => {
        rebuildAndRegister(s, dir)
        Tables(s, dir, "orders").agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).as("sum_dec"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
          .select(col("n_orders"), col("sum_dec").cast("double").as("sum_price"),
            col("min_price"), col("max_price"))
      }),

    // Group-key-filtered read answered from the registered view: the
    // filter commutes with the grouping (constant within each group),
    // so the rewrite pushes it onto the view scan — the oracle is the
    // full filtered recompute it must be indistinguishable from.
    Q("ivm3c_mv_key_filter", Some(
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders WHERE o_custkey % 5 = 2
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      ivm3c),

    // KEY-FUNCTIONAL regroup answered from the registered view: grouping
    // by a deterministic function of the view key partitions the key
    // space, so the rewrite re-aggregates the stored partials BY that
    // function (count -> sum of counts, sum -> sum of exact decimal
    // sums, min/max -> fold of per-key extrema) — the banded warehouse
    // read (`GROUP BY custkey % N`) at view cost. The oracle is the
    // full recompute it must be indistinguishable from.
    Q("ivm3e_mv_regroup", Some(
      """SELECT o_custkey % 10 AS cust_band, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey % 10 ORDER BY cust_band""".stripMargin),
      ivm3e),

    // count(DISTINCT key) answered from the registered view: the number
    // of distinct non-null keys in the base IS the count of the view's
    // rows (one per group), so the rewrite answers the "how many
    // customers" read with a count over the view scan — no fact scan,
    // no distinct machinery. Mixed with plain partials in one aggregate;
    // the oracle is the full recompute.
    Q("ivm3f_mv_count_distinct", Some(
      """SELECT count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders,
        |  min(o_totalprice) AS min_price
        |FROM orders""".stripMargin),
      (s, dir) => {
        rebuildAndRegister(s, dir)
        Tables(s, dir, "orders").agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"))
      }),

    // The AVG read from count+sum partials: Spark executes the view
    // division (MvRewriteSpec pins the plan and exact decimal values);
    // the oracle recomputes from the base with the same exact decimal
    // sum, divided in double and rounded on the shared scale-4 grid.
    Q("ivm3g_mv_avg", Some(
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(((2 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |               * 100000000 AS HUGEINT) + count(*)) // (2 * count(*))
        |        * 2 + 10000) // 20000 AS DOUBLE) / 10000 AS avg_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      ivm3g),

    // The second DECLARED view (lineitem by l_partkey, count/sum/min)
    // through the same generic refresh: the oracle applies the identical
    // changelog row-level and fully recomputes — the declaration, not
    // copied operators, must land on the same answer.
    Q("ivm5_declared_view", Some(
      """WITH cutv AS (SELECT (max(l_orderkey) + 1) // 2 AS cut FROM lineitem),
        |survivors AS (
        |  SELECT l_partkey,
        |    CAST(l_quantity AS DECIMAL(18,4)) +
        |      CASE WHEN l_orderkey % 7 = 3 THEN CAST(1.0000 AS DECIMAL(18,4))
        |           ELSE CAST(0 AS DECIMAL(18,4)) END AS q,
        |    l_extendedprice AS v
        |  FROM lineitem, cutv
        |  WHERE l_orderkey < cut
        |    AND NOT (l_orderkey % 13 = 5 AND l_orderkey % 7 <> 3)),
        |ins AS (
        |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,4)) AS q,
        |         l_extendedprice AS v
        |  FROM lineitem, cutv WHERE l_orderkey >= cut),
        |final AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins)
        |SELECT l_partkey, count(*) AS n_items, CAST(sum(q) AS DOUBLE) AS sum_qty,
        |  min(v) AS min_eprice
        |FROM final GROUP BY l_partkey ORDER BY l_partkey""".stripMargin),
      ivm5),

    // IN-list group-key read routed through the MULTI-VIEW registry:
    // both views registered, the lineitem read must answer from the
    // lineitem store with the IN pushed onto the view scan — the oracle
    // is the full filtered recompute it must be indistinguishable from.
    Q("ivm3d_mv_inlist", Some(
      """SELECT l_partkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  min(l_extendedprice) AS min_eprice
        |FROM lineitem WHERE l_partkey IN (2,3,5,7,11,13,17,19)
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin),
      ivm3d),

    // TWO-SOURCE extrema through the generic refresh: min(quantity) and
    // max(extended price) in ONE view, each source gated and recomputed
    // against its OWN removed/added population. The oracle applies the
    // identical changelog row-level and fully recomputes all four
    // aggregates — cross-source independence must be invisible in the
    // answer.
    Q("ivm6_multi_ext", Some(
      """WITH cutv AS (SELECT (max(l_orderkey) + 1) // 2 AS cut FROM lineitem),
        |survivors AS (
        |  SELECT l_suppkey,
        |    CAST(l_quantity AS DECIMAL(18,4)) +
        |      CASE WHEN l_orderkey % 7 = 3 THEN CAST(1.0000 AS DECIMAL(18,4))
        |           ELSE CAST(0 AS DECIMAL(18,4)) END AS qd,
        |    CASE WHEN l_orderkey % 7 = 3 THEN l_quantity + 1.0
        |         ELSE l_quantity END AS q,
        |    l_extendedprice AS ep
        |  FROM lineitem, cutv
        |  WHERE l_orderkey < cut
        |    AND NOT (l_orderkey % 13 = 5 AND l_orderkey % 7 <> 3)),
        |ins AS (
        |  SELECT l_suppkey, CAST(l_quantity AS DECIMAL(18,4)) AS qd,
        |         l_quantity AS q, l_extendedprice AS ep
        |  FROM lineitem, cutv WHERE l_orderkey >= cut),
        |final AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins)
        |SELECT l_suppkey, count(*) AS n_lines, CAST(sum(qd) AS DOUBLE) AS sum_qty,
        |  min(q) AS min_qty, max(ep) AS max_eprice
        |FROM final GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      ivm6),

    // The events-vocabulary view: per-user count / exact value sum /
    // value extrema maintained by the insert-only refresh over the
    // median-split feed — the refreshed view must equal the full
    // recompute over all events.
    Q("ivm7_events_view", Some(
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      ivm7),

    // The distinct-count vocabulary maintained EXACTLY under a full
    // insert/update/delete changelog via the keyed pair store: the
    // oracle applies the same changelog row-level and fully recomputes
    // count / exact sum / count(DISTINCT l_partkey) — a supplier loses
    // a distinct part only when its LAST line of that part retracts,
    // which is precisely what the pair multiplicities encode.
    Q("ivm8_distinct_view", Some(
      """WITH cutv AS (SELECT (max(l_orderkey) + 1) // 2 AS cut FROM lineitem),
        |survivors AS (
        |  SELECT l_suppkey,
        |    CAST(l_quantity AS DECIMAL(18,4)) +
        |      CASE WHEN l_orderkey % 7 = 3 THEN CAST(1.0000 AS DECIMAL(18,4))
        |           ELSE CAST(0 AS DECIMAL(18,4)) END AS qd,
        |    l_partkey AS pk
        |  FROM lineitem, cutv
        |  WHERE l_orderkey < cut
        |    AND NOT (l_orderkey % 13 = 5 AND l_orderkey % 7 <> 3)),
        |ins AS (
        |  SELECT l_suppkey, CAST(l_quantity AS DECIMAL(18,4)) AS qd,
        |         l_partkey AS pk
        |  FROM lineitem, cutv WHERE l_orderkey >= cut),
        |final AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins)
        |SELECT l_suppkey, count(*) AS n_lines, CAST(sum(qd) AS DOUBLE) AS sum_qty,
        |  count(DISTINCT pk) AS n_parts
        |FROM final GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      ivm8),

    // Sketched distinct (round-15 #8): insert-only fold, so the final
    // population is the WHOLE table; the sketch's estimate is asserted
    // in-bound, the exact twin is oracled bit-for-bit (a2c's form).
    Q("ivm8c_sketched_distinct", Some(
      """SELECT l_suppkey, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(DISTINCT l_partkey) AS n_parts_exact,
        |  1 AS hll_within_5pct
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      ivm8c),

    // The distinct-count READ through the MV rewrite: Spark executes
    // the SupplierParts store substitution (MvRewriteSpec pins the
    // plan), the oracle is the full recompute it must match.
    Q("ivm8b_mv_distinct", Some(
      """SELECT l_suppkey, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      ivm8b),

    // IVM over a JOIN view (star-schema delta-join: static dim,
    // insert-only fact) — the refreshed per-nation view must equal the
    // full join + recompute.
    Q("ivm4_join_view", Some(
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      ivm4)
  )
}
