package graft

import graft.quality.EntityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the er entity-resolution family (the DuckDB oracle pins exact
  * values; these pin the blocking-audit and clustering invariants).
  */
class EntitySpec extends AnyFunSuite with SparkSuite {

  test("er1: blocking cap is audited — clean at default, planted overflow reported") {
    val names = EntityOps.nameTrigrams(spark, sf)
    assert(EntityOps.droppedTrigramBlocks(names).count() == 0,
      "default cap should drop nothing on the corpus vocabulary")
    val dropped = EntityOps.droppedTrigramBlocks(names, cap = 1).collect()
    assert(dropped.nonEmpty, "cap=1 must report shared trigrams as dropped blocks")
    assert(dropped.forall(_.getLong(1) > 1))
  }

  test("er1/er2: a planted near-identical name pair matches and clusters together") {
    import spark.implicits._
    // drive the core over a synthetic vocabulary via the same operators
    val names = Seq("acme corporation", "acme corporatian", "globex llc",
      "initech inc", "initech incorporated", "umbrella co")
      .toDF("name")
      .withColumn("tgs", array_distinct(expr(
        "transform(sequence(1, greatest(1, length(name) - 2)), i -> substring(name, i, 3))")))
    val tg = EntityOps.blockedTrigrams(names)
    val cand = tg.as("l").join(tg.as("r"), col("l.tg") === col("r.tg"))
      .filter(col("l.name") < col("r.name"))
      .select(col("l.name").as("a"), col("r.name").as("b")).distinct()
    val pairs = cand
      .join(names.select(col("name").as("a"), col("tgs").as("ta")), "a")
      .join(names.select(col("name").as("b"), col("tgs").as("tb")), "b")
      .withColumn("jacc",
        size(array_intersect(col("ta"), col("tb"))).cast("double")
          / size(array_union(col("ta"), col("tb"))))
      .filter(col("jacc") >= 0.5)
      .select("a", "b", "jacc")
      .collect()
    assert(pairs.exists(r =>
      r.getString(0) == "acme corporatian" && r.getString(1) == "acme corporation"),
      s"typo pair must match: ${pairs.toSeq}")
    assert(pairs.exists(r =>
      r.getString(0) == "initech inc" && r.getString(1) == "initech incorporated"))
    assert(!pairs.exists(r => r.getString(0).startsWith("globex")
      || r.getString(1).startsWith("globex")), "globex has no near-duplicate")
  }

  test("er2: every name labeled exactly once; canonical is a member of the vocabulary") {
    val ents = EntityOps.canonicalEntities(spark, sf).collect()
    val names = ents.map(_.getString(0))
    assert(names.distinct.length == names.length)
    val nameSet = names.toSet
    assert(ents.forall(r => nameSet(r.getString(1))),
      "every canonical label must itself be a vocabulary name")
    // canonical is the minimum of its cluster
    val byCanon = ents.groupBy(_.getString(1))
    assert(byCanon.forall { case (c, members) => members.map(_.getString(0)).min == c })
  }
}
