package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 / the 100 TB playbook).
  *
  * AQE's skew-join handles sort-merge skew automatically; salting is the
  * explicit fallback when one side must be replicated — e.g. a hot key
  * joining a non-broadcastable dimension. The big side gets a random salt
  * in [0, n); the small side is replicated n times with every salt value;
  * the join key becomes (key, salt), splitting each hot key's rows across
  * n reducers.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column, smallKey: Column,
      salts: Int, seed: Long = 42L): DataFrame = {
    val salted = big.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated,
      bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** j10 — the salted join run over a DELIBERATELY skewed key: ~70% of
    * lineitem rows collapse onto hot key 0 (`l_orderkey % 10 < 7`), the
    * rest spread over 996 residue keys, joined to a 997-row derived
    * dimension. The `shuffle_hash` hint on the dimension keeps the plan
    * honest — at fixture scale Spark would broadcast a 997-row dim and
    * no skew would ever reach a shuffle, but the salted path exists
    * precisely for dims too large to broadcast, so the query forces the
    * shuffled regime the 100 TB case lives in. Correctness is
    * salt-independent: the salt is an AND-ed equi-key that partitions
    * each hot key's rows across `salts` reducers without changing the
    * join's row multiset, so the post-join aggregate oracles exactly.
    * SkewJoinSpec pins the physical shape (salt in the join keys, no
    * broadcast); this query puts the machinery under the driver's
    * per-round correctness + bench gates.
    */
  def skewedSaltedAgg(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val big = graft.Tables(s, dir, "lineitem").select(
      when(col("l_orderkey") % 10 < 7, lit(0L))
        .otherwise(col("l_orderkey") % 997).as("hk"),
      col("l_extendedprice"))
    val dim = graft.Tables(s, dir, "part")
      .groupBy((col("p_partkey") % 997).as("k"))
      .agg(count(lit(1)).as("dim_n"))
    saltedJoin(big, dim.hint("shuffle_hash"), col("hk"), col("k"), salts = 32)
      .groupBy("hk")
      .agg(count(lit(1)).as("n"), sum("dim_n").as("dim_total"),
        graft.Dec.dsum(col("l_extendedprice")).as("price_sum"))
      .orderBy("hk")
  }

  val skewedSaltedAggSql: String =
    s"""WITH big AS (
       |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
       |              ELSE l_orderkey % 997 END AS hk, l_extendedprice
       |  FROM lineitem),
       |dim AS (SELECT p_partkey % 997 AS k, count(*) AS dim_n
       |        FROM part GROUP BY 1)
       |SELECT hk, count(*) AS n, CAST(sum(dim_n) AS BIGINT) AS dim_total,
       |  ${graft.Dec.sqlSum("l_extendedprice")} AS price_sum
       |FROM big JOIN dim ON hk = k
       |GROUP BY hk ORDER BY hk""".stripMargin
}
