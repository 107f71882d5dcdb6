package graft

import graft.tensor.TensorFunctions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5): the flatten+shape encode/decode laws hold
  * for arbitrary ragged shapes and values. Uses ScalaCheck generators
  * directly (pinned seeds → reproducible cases).
  */
class TensorPropertySpec extends AnyFunSuite with SparkSuite {

  private val tensorGen: Gen[(Array[Float], Long, Long)] = for {
    n <- Gen.choose(1, 20)
    m <- Gen.choose(1, 8)
    data <- Gen.listOfN(n * m, Gen.chooseNum(-1e6f, 1e6f))
  } yield (data.toArray, n.toLong, m.toLong)

  private def cases(count: Int): Seq[(Array[Float], Long, Long)] =
    (0 until count).flatMap(i => tensorGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("law: tensor_explode(flatten(t), shape(t)) reassembles t row-major") {
    TensorFunctions.register(spark)
    import spark.implicits._
    cases(25).foreach { case (data, n, m) =>
      val df = Seq((data, Array(n, m))).toDF("data", "shape")
      df.createOrReplaceTempView("prop_t")
      val rows = spark.sql(
        """SELECT t.idx, t.slice FROM prop_t
          |LATERAL VIEW tensor_explode(data, shape) t AS idx, slice""".stripMargin)
        .orderBy("idx").collect()
      assert(rows.length == n, s"n=$n m=$m")
      val reassembled = rows.flatMap(_.getSeq[Float](1))
      assert(reassembled.toSeq == data.toSeq, s"n=$n m=$m")
      rows.foreach(r => assert(r.getSeq[Float](1).length == m))
    }
  }

  test("law: flatten(tensor_reshape(d, m)) == d for any divisible length") {
    TensorFunctions.register(spark)
    import spark.implicits._
    cases(25).foreach { case (data, _, m) =>
      val df = Seq((data, m.toInt)).toDF("data", "k")
      df.createOrReplaceTempView("prop_r")
      val back = spark.sql("SELECT flatten(tensor_reshape(data, k)) AS f FROM prop_r")
        .collect()(0).getSeq[Float](0)
      assert(back.toSeq == data.toSeq, s"m=$m len=${data.length}")
    }
  }
}
