package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkSuite {

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (0 until 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k2", "name")
    val plain = big.join(small, col("k") === col("k2"))
      .select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(big, small, col("k"), col("k2"), salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
