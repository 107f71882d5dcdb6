package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

/** Misra–Gries frequent-items summary as a typed, MERGEABLE
  * [[Aggregator]] — the sketch answer to "top tokens over a corpus too
  * wide to hash-aggregate exactly". x15 counts bigrams exactly with a
  * full groupBy; at open vocabulary (URLs, code identifiers) the exact
  * map is unbounded, while this summary is a fixed k counters per
  * partition, merged pairwise with the (k+1)-th-count subtraction rule
  * (Agarwal et al., "Mergeable Summaries", PODS'12), preserving the
  * deterministic guarantee: `true − N/(k+1) ≤ est ≤ true`, and every
  * item with true count > N/(k+1) survives. No randomness, no seeds —
  * unlike CMS/HLL the result is reproducible bit-for-bit on any
  * partitioning, which is what lets the driver oracle it.
  *
  * Scale shape: classic partial-aggregate — k counters per partition
  * flow up a merge tree; the shuffle carries one k-entry map per
  * partition, never token-level rows. With k ≥ distinct-token count the
  * summary never evicts and is EXACT (the x16 query's regime, pinned by
  * spec 1); the bounds above govern the tight-capacity regime (spec 2).
  *
  * The per-row eviction path (decrement-all) is O(k) but only runs when
  * a NEW token arrives with the summary full — amortized O(1) per
  * eviction epoch; the common path is a single map update.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      // full and unseen: decrement every counter (the arriving token's
      // implicit counter hits 0 immediately and is not stored)
      case None => b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], c: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ c.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + c.getOrElse(t, 0L))).toMap
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest combined count from everything and
      // keep the survivors — the PODS'12 merge that keeps total
      // decrement ≤ N/(k+1) across any merge tree
      val thr = m.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      m.view.mapValues(_ - thr).filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** x16 — corpus heavy hitters via the mergeable summary. Capacity must
  * exceed the corpus vocabulary for the sketch to run in its exact
  * regime — the condition that makes the DuckDB exact count a true
  * oracle. The driver generator's vocabulary is 31 tokens at every SF,
  * but GenScale's token-suffix mutation (tools/GenScale.scala) mints
  * ~14 suffixed variants per extra copy: 157 distinct tokens at sf1.0
  * (10 copies), which overflowed the original capacity of 64 and pushed
  * the sketch into its bounded-error regime — caught as an x16 oracle
  * mismatch in the first sf1.0 sweep. 1024 covers any extension the
  * sweep tooling can produce (31 + 14·(copies−1) ≤ 1024 up to 71
  * copies; GenScale's embedding-rotation guard caps copies at the
  * 64-float vector length before that); MisraGriesSpec separately
  * proves the tight-capacity bounds the open-vocabulary regime relies
  * on, so exactness here is a regime choice, not a hidden assumption.
  */
object MisraGriesOps extends OpModule {

  val Capacity = 1024

  val qs: Seq[Q] = Seq(
    Q("x16_heavy_hitters", Some(
      """SELECT token, CAST(n AS BIGINT) AS n FROM (
        |  SELECT token, count(*) AS n
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |        FROM documents) t
        |  GROUP BY token)
        |ORDER BY n DESC, token LIMIT 20""".stripMargin),
      (s, dir) => {
        import s.implicits._
        // explode_OUTER + null filter, not plain explode:
        // InferFiltersFromGenerate would push a size(split(...)) > 0
        // scan filter that tokenizes every document a second time (the
        // same trap DedupOps.tokenCodesOf documents)
        val toks = Tables(s, dir, "documents")
          .select(explode_outer(split(trim(col("text")), "\\s+")).as("token"))
          .filter(col("token").isNotNull)
          .as[String]
        toks.select(MisraGries(Capacity).toColumn.name("m"))
          .select(explode(col("m")).as(Seq("token", "n")))
          .orderBy(col("n").desc, col("token")).limit(20)
      })
  )
}
