package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** User-facing reader over one-row-per-event ragged-tensor parquet — the
  * Spark-native equivalent of the reference's reader/dataset classes
  * (`UBParquetReader`, /root/reference/readparquet.py:5-34;
  * `larmatchDataset`, /root/reference/larmatch2d/larmatch_dataset.py:62-180):
  * schema-merged multi-file scan, optional column projection, entry count,
  * index and key random access, Bernoulli sampling with retry, and
  * partition-sliced batch iteration.
  *
  * Unlike the reference (which decodes whole rows to NumPy in the client),
  * every access path here stays a Catalyst plan until the final collect —
  * key lookups prune via parquet stats, projections prune columns.
  */
class EventReader(
    spark: SparkSession,
    path: String,
    columns: Option[Seq[String]] = None,
    mergeSchema: Boolean = true) {

  /** The projected relation (P1: select(*cols) vs select("*")). */
  lazy val df: DataFrame = {
    val base = spark.read.option("mergeSchema", mergeSchema.toString).parquet(path)
    columns.map(cs => base.select(cs.map(col): _*)).getOrElse(base)
  }

  /** Entry order: the reference relies on file order; Spark has no stable
    * implicit order, so entries are ranked by the composite event key.
    *
    * Scale-safe ranking: a global `row_number() OVER (ORDER BY ...)`
    * window funnels the whole table through ONE reducer; instead the
    * table is range-partitioned on the key (globally ordered partitions),
    * sorted within each partition, and indices are assigned from
    * cumulative per-partition counts (`zipWithIndex` — one small count
    * job, then a map). This is the distributed form of the reference's
    * own `set_partition` offset math (larvoxel_dataset.py:196-201): no
    * stage ever sees more than its partition.
    *
    * The composite key (run, subrun, event) is assumed UNIQUE per row —
    * the reference's event files guarantee this (one row per detector
    * event). Were keys duplicated, the order among ties (hence their
    * `__entry` assignment) would be nondeterministic across computations.
    *
    * The indexed RDD is PERSISTED on first use: every access path here
    * (`getEntry(i)`, each `partitionSlice`) is an action, and without
    * persistence each one would re-run the full range-shuffle + sort +
    * zipWithIndex. Call [[unpersistIndex]] to release the storage.
    */
  private lazy val indexedRdd = {
    val keys = Seq(col("run"), col("subrun"), col("event"))
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private lazy val indexed: DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("__entry", LongType, nullable = false))
    spark.createDataFrame(indexedRdd, schema)
  }

  /** Release the persisted entry index (no-op if never computed). */
  def unpersistIndex(): Unit = indexedRdd.unpersist()

  lazy val nentries: Long = df.count()

  /** Random access by entry index (P6, readparquet.py:14-34). */
  def getEntry(i: Long): Option[Row] = {
    require(i >= 0, s"entry $i out of range")
    indexed.filter(col("__entry") === i).drop("__entry").collect().headOption
  }

  /** Keyed lookup (P5, larmatch_dataset.py:137-142) — stat-pruned scan. */
  def getEntry(run: Long, subrun: Long, event: Long): Option[Row] =
    df.filter(col("run") === run && col("subrun") === subrun && col("event") === event)
      .collect().headOption

  /** Bernoulli sample with retry (R1, larmatch_dataset.py:144-157). */
  def sampleEntry(seed: Long = 42L, nPerAttempt: Int = 10): Row = {
    val frac = math.min(1.0, nPerAttempt.toDouble / math.max(1L, nentries))
    var attempt = 0
    while (attempt < 100) {
      val rows = df.sample(withReplacement = false, frac, seed + attempt).limit(1).collect()
      if (rows.nonEmpty) return rows(0)
      attempt += 1
    }
    df.limit(1).collect()(0)
  }

  /** Worker shard (W3 set_partition, larvoxel_dataset.py:196-201): rows
    * [start, end) of the entry order for worker `w` of `n`.
    */
  def partitionSlice(w: Int, n: Int): DataFrame = {
    require(w >= 0 && w < n)
    val per = (nentries + n - 1) / n
    indexed.filter(col("__entry") >= w * per && col("__entry") < (w + 1) * per)
      .drop("__entry")
  }

  /** Epoch iterator (R3): deterministic order, optionally seeded-shuffled
    * (R2, larvoxel_dataset.py:66-69).
    */
  def epoch(shuffleSeed: Option[Long] = None): Iterator[Row] = {
    val ordered = shuffleSeed match {
      case Some(s) => df.orderBy(rand(s), col("run"), col("subrun"), col("event"))
      case None => df.orderBy("run", "subrun", "event")
    }
    val it = ordered.toLocalIterator()
    new Iterator[Row] { def hasNext = it.hasNext; def next() = it.next() }
  }
}
