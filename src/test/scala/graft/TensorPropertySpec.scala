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

  test("law: float_dot/float_norm/float_l2sq equal the sequential-fold model bit-for-bit") {
    // The kernels' arithmetic contract (left-to-right double-widened fold)
    // against a plain Scala model, over arbitrary values — the property
    // the DuckDB oracle parity of every similarity query rests on.
    graft.tensor.VectorFunctions.register(spark)
    import spark.implicits._
    val pairGen: Gen[(Array[Float], Array[Float])] = for {
      n <- Gen.choose(1, 64)
      a <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
      b <- Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f))
    } yield (a.toArray, b.toArray)
    val pairs = (0 until 40)
      .flatMap(i => pairGen.apply(Gen.Parameters.default, Seed(1000L + i)))
    def modelDot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }; acc
    }
    def modelL2Sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }; acc
    }
    def modelNorm(a: Array[Float]): Double =
      math.sqrt(modelDot(a, a))
    val df = pairs.toDF("a", "b")
    val rows = df.selectExpr("a", "b",
      "float_dot(a, b) AS d", "float_l2sq(a, b) AS l", "float_norm(a) AS n").collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0).toArray
      val b = r.getSeq[Float](1).toArray
      // == on Double: bit-identical (no tolerance) is the contract
      assert(r.getDouble(2) == modelDot(a, b))
      assert(r.getDouble(3) == modelL2Sq(a, b))
      assert(r.getDouble(4) == modelNorm(a))
    }
  }
}
