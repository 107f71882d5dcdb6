package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the multi-column pruning claim, measured. */
class ZOrderSpec extends AnyFunSuite with SparkSuite {

  test("z-ordered layout prunes row groups on BOTH dimensions; single sort only on its own") {
    val ((sortedA, sortedB), (zA, zB)) = etl.ZOrder.zorderPruneStats(spark, sf)
    val total = Tables(spark, sf, "lineitem").count()

    // the dedicated sort is (near-)optimal on its own column
    assert(sortedA < total / 4, s"A-sorted layout did not prune an A-range: $sortedA of $total")
    // …but a range on the OTHER column reads essentially everything
    assert(sortedB > total / 2, s"expected the A-sorted layout NOT to prune a B-range: $sortedB of $total")
    // the z-layout prunes BOTH dimensions
    assert(zA < total / 2, s"z-layout did not prune an A-range: $zA of $total")
    assert(zB < total / 2, s"z-layout did not prune a B-range: $zB of $total")
    // and beats the single-sort layout decisively where it matters
    assert(zB * 2 < sortedB, s"z-layout B-range $zB not clearly better than single-sort $sortedB")
  }

  test("quantile ranks keep pruning alive on a heavy-tailed key where linear ranks collapse") {
    import spark.implicits._
    // heavy-tailed A: 95% of rows in [0, 100], tail out to ~10^7 — the
    // linear 16-bit rank maps the dense 95% into rank cell 0, so every
    // file overlaps it; quantile ranks spread those rows across ~all
    // cells. B uniform.
    val rng = new scala.util.Random(42)
    val df = (0 until 60000).map { i =>
      val a = if (i % 20 == 0) (rng.nextDouble() * 1e7).toLong + 100L
              else rng.nextInt(100).toLong
      (a, rng.nextInt(10000).toLong, i.toLong)
    }.toDF("a", "b", "id")
    val base = etl.ScratchDirs.keyed("zorder_skew", sf)
    etl.ZOrder.zorderWrite(df, "a", "b", s"$base/linear", numFiles = 4,
      rowGroupBytes = 32 * 1024)
    etl.ZOrder.zorderWriteQuantile(df, "a", "b", s"$base/quantile", numFiles = 4,
      rowGroupBytes = 32 * 1024)
    // probe a narrow range INSIDE the dense region
    def probe(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("a").between(40, 45))
      q.collect()
      plans.PlanScans.fileScans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    val (lin, quant) = (probe(s"$base/linear"), probe(s"$base/quantile"))
    val total = df.count()
    assert(lin > total / 2,
      s"expected the linear-rank layout NOT to prune inside the dense region: $lin of $total")
    assert(quant * 2 < lin, s"quantile layout $quant not clearly better than linear $lin")
    assert(quant < total / 2, s"quantile layout did not prune: $quant of $total")
  }

  test("z-order write preserves content exactly") {
    val base = etl.ScratchDirs.keyed("zorder_roundtrip", sf)
    val li = Tables(spark, sf, "lineitem")
    etl.ZOrder.zorderWrite(li, "l_partkey", "l_suppkey", base, numFiles = 3)
    val back = spark.read.parquet(base)
    assert(back.count() == li.count())
    // order-free content fingerprint over the full row
    def fp(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row = {
      val h = md5(concat_ws("|", df.columns.sorted.map(col): _*))
      df.agg(min(h), max(h), count(lit(1))).collect()(0)
    }
    assert(fp(back) == fp(li), "z-order write changed content")
  }
}
