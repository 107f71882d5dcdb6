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
}
