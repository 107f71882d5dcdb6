package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.IvmOps

/** Property law for the IVM retraction algebra: for ANY valid changelog
  * (inserts always; updates/deletes only of rows that exist at that
  * point), folding it through [[IvmOps.refreshWithRetractions]] in any
  * batch partitioning equals the direct per-key recompute of the final
  * row multiset — including groups that retract to zero and groups that
  * are born, die, and are re-born within one changelog. Pinned seeds →
  * reproducible cases.
  */
class IvmPropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // One generated scenario: an op sequence over a 5-key space, validity
  // maintained against a running row model (op targets only live rows).
  // Prices are integer cents so the reference model is exact in Long.
  private case class Scenario(adjustments: List[(Long, Long, Long)], // (ck, dn, dCents)
      finalRows: Map[Long, List[Long]]) // ck -> live price cents

  private def scenarioGen: Gen[Scenario] = {
    def step(n: Int, live: Map[Long, List[Long]],
        acc: List[(Long, Long, Long)]): Gen[Scenario] =
      if (n == 0) Gen.const(Scenario(acc.reverse, live))
      else Gen.choose(0, 2).flatMap {
        case 0 => // insert
          for {
            ck <- Gen.choose(0L, 4L)
            cents <- Gen.choose(1L, 99999L)
            r <- step(n - 1, live.updated(ck, cents :: live.getOrElse(ck, Nil)),
              (ck, 1L, cents) :: acc)
          } yield r
        case 1 if live.exists(_._2.nonEmpty) => // update a live row
          for {
            ck <- Gen.oneOf(live.filter(_._2.nonEmpty).keys.toSeq)
            bump <- Gen.choose(-500L, 500L)
            old = live(ck).head
            r <- step(n - 1, live.updated(ck, (old + bump) :: live(ck).tail),
              (ck, 0L, bump) :: acc)
          } yield r
        case 2 if live.exists(_._2.nonEmpty) => // delete a live row
          for {
            ck <- Gen.oneOf(live.filter(_._2.nonEmpty).keys.toSeq)
            old = live(ck).head
            r <- step(n - 1, live.updated(ck, live(ck).tail),
              (ck, -1L, -old) :: acc)
          } yield r
        case _ => step(n, live, acc) // nothing live to mutate — retry
      }
    Gen.choose(5, 30).flatMap(n => step(n, Map.empty, Nil))
  }

  private def cases(count: Int): Seq[Scenario] =
    (0 until count).flatMap(i =>
      scenarioGen.apply(Gen.Parameters.default, Seed(7000L + i)))

  private def toDf(adj: Seq[(Long, Long, Long)]) =
    adj.toDF("o_custkey", "dn", "cents")
      .select(col("o_custkey"), col("dn"),
        (col("cents").cast(DecimalType(18, 4)) / 100).cast(DecimalType(28, 4)).as("ds"))

  private val emptyStore = Seq.empty[(Long, Long, java.math.BigDecimal)]
    .toDF("o_custkey", "n_orders", "sum_dec")
    .select(col("o_custkey"), col("n_orders"),
      col("sum_dec").cast(DecimalType(28, 4)).as("sum_dec"))

  test("law: any batch partitioning of a valid changelog folds to the direct recompute") {
    cases(12).zipWithIndex.foreach { case (sc, i) =>
      // partition the ops into 1..3 sequential batches, deterministic per case
      val nBatches = 1 + (i % 3)
      val size = math.max(1, sc.adjustments.size / nBatches)
      val batches = sc.adjustments.grouped(size).toList
      val folded = batches.foldLeft(emptyStore) { (store, batch) =>
        IvmOps.refreshWithRetractions(store, toDf(batch))
          .select(col("o_custkey"), col("n_orders"),
            col("sum_dec").cast(DecimalType(28, 4)).as("sum_dec"))
          .localCheckpoint(true)
      }
      val got = folded.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).movePointRight(2).longValueExact())).toSet
      val want = sc.finalRows.collect {
        case (ck, rows) if rows.nonEmpty =>
          (ck, rows.size.toLong, rows.sum) // sum in cents, like `got`
      }.toSet
      assert(got == want,
        s"case $i (${nBatches} batches, ${sc.adjustments.size} ops): $got != $want")
    }
  }
}
