package graft.streaming

import graft.ops.MisraGries
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twin of x16's Misra–Gries heavy hitters: frequency
  * tracking over an unbounded token stream with BOUNDED state — the
  * monitoring job a corpus-ingest pipeline runs beside the crawl
  * ("what's trending in the data we're pulling in right now").
  *
  * Scale design: a single global summary would funnel every token to
  * one task, so the token space is hash-SHARDED (`pmod(xxhash64)`,
  * deterministic) and each shard key holds its own k-counter summary in
  * `transformWithState` ValueState (RocksDB-backed, same provider the
  * TwsSessionStream pins). Shards partition the token space, so the
  * global answer is the plain UNION of shard summaries — no cross-shard
  * merge rule needed — and each shard inherits the classic sequential
  * MG guarantee over ITS substream: `true − N_shard/(k+1) ≤ est ≤
  * true`, with exactness when k ≥ the shard's distinct-token count.
  * State per shard is ≤ k counters regardless of stream length; each
  * micro-batch emits the shard's current summary tagged with a
  * monotone `seq`, so a consumer (and the spec) reads "latest seq per
  * shard" as the live answer — the same update-stream contract as the
  * session stores.
  *
  * The per-row reduce is the SAME `MisraGries.reduce` the batch x16
  * Aggregator runs — one summary algebra, two execution modes, which
  * is what makes the streamed == batch law testable at all
  * (HeavyHitterStreamSpec replays the corpus in chunks and pins the
  * streamed top-k equal to the batch query's).
  */
object HeavyHitterStream {

  case class TokRow(shard: Int, token: String)
  case class MgState(m: Map[String, Long], seq: Long)
  case class ShardSummary(shard: Int, seq: Long, token: String, est: Long)

  class MgProcessor(k: Int) extends StatefulProcessor[Int, TokRow, ShardSummary] {
    @transient private var st: ValueState[MgState] = _
    private val mg = MisraGries(k)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MgState]("mg_summary",
        Encoders.product[MgState], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[TokRow],
        timerValues: TimerValues): Iterator[ShardSummary] = {
      val prior = if (st.exists()) st.get() else MgState(Map.empty, 0L)
      var m = prior.m
      rows.foreach(r => m = mg.reduce(m, r.token))
      val next = MgState(m, prior.seq + 1)
      st.update(next)
      m.iterator.map { case (t, c) => ShardSummary(key, next.seq, t, c) }
    }
  }

  /** The sharded token stream from a staged documents directory (one
    * whitespace token per row, empty tokens dropped; explode_outer for
    * the InferFiltersFromGenerate double-tokenization reason the batch
    * ops document).
    */
  def tokenStream(spark: SparkSession, stagingDir: String,
      shards: Int): DataFrame = {
    val schema = graft.EventTs.probeSchemaOr(spark, stagingDir, DedupStream.docSchema)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagingDir)
      .select(explode_outer(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .withColumn("shard", pmod(xxhash64(col("token")), lit(shards)).cast("int"))
      .select("shard", "token")
  }

  /** Run the sharded MG stream to completion over the staged files
    * (memory sink; RocksDB provider forced for the query's lifetime and
    * restored after). Returns every per-batch summary emission; the
    * live answer is the max-`seq` row set per shard.
    */
  def runToCompletion(spark: SparkSession, stagingDir: String,
      queryName: String, k: Int = 64, shards: Int = 8): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val summaries = tokenStream(spark, stagingDir, shards)
        .as[TokRow]
        .groupByKey(_.shard)
        .transformWithState(new MgProcessor(k), TimeMode.None(),
          OutputMode.Update(), Encoders.product[ShardSummary])
      val q = summaries.writeStream
        .outputMode("update").format("memory").queryName(queryName).start()
      q.processAllAvailable()
      q.stop()
      spark.table(queryName)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
