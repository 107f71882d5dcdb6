package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.11): each purchase joined to
  * the same user's errors arriving within the following 6 hours — the
  * "action → nearby consequence" correlation a live event pipeline runs
  * continuously (the streaming generalization of the batch j5/j8 family).
  *
  * Both sides carry event-time watermarks AND the join condition bounds
  * event time in both directions, so Spark can prove state finite: a
  * buffered purchase is dropped once the error-side watermark passes
  * `p_ts + 6 h`, and a buffered error once the purchase-side watermark
  * passes `e_ts` — without the range condition a stream-stream join must
  * keep EVERY row forever. That state bound is the whole point at scale;
  * an inner interval join additionally emits matches immediately (no
  * watermark hold on output).
  *
  * StreamingSpec pins streamed == the batch st3_interval_join twin.
  */
object JoinStream {

  /** @param watermark allowed event-time lateness. Production keeps this
    *   small (minutes) so join state stays tight; the equality spec passes
    *   a value wider than the fixture's whole time span so its
    *   DELIBERATELY out-of-order replay (maxFilesPerTrigger=1 over
    *   id-interleaved files) exercises the cross-batch state buffers
    *   without any late-drop — the streamed result must then equal the
    *   batch twin exactly. The complementary tight-watermark spec
    *   (StreamingSpec "tight watermark actually drops late rows") pins the
    *   drop side: a planted behind-watermark error is excluded from the
    *   streamed result while the batch twin matches it.
    * @param maxFilesPerTrigger file-source throttle; Some(1) forces one
    *   file per micro-batch (the multi-batch path), None lets the source
    *   take everything available at once.
    */
  /** @param joinType `inner` (matches emit immediately) or `left_outer`
    *   — the streamed twin of the batch st3c: a purchase with no error
    *   inside its window emits a null-padded row, but only once the
    *   error-side watermark has passed `p_ts + 6 h` and Spark can PROVE
    *   no match can still arrive. Outer results are therefore
    *   watermark-gated: on a bounded stream the trailing unmatched rows
    *   need a later watermark-advancing event (or they stay buffered) —
    *   the StreamingSpec fixture plants sentinels for exactly that.
    */
  def purchaseErrorJoin(spark: SparkSession, dir: String,
      watermark: String = "10 minutes",
      maxFilesPerTrigger: Option[Int] = None,
      joinType: String = "inner"): DataFrame = {
    def side(tpe: String, pre: String): DataFrame = {
      EventStream.eventStream(spark, dir, maxFilesPerTrigger)
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${pre}_id"), col("user_id").as(s"${pre}_user"),
          col("ts").as(s"${pre}_ts"))
        .withWatermark(s"${pre}_ts", watermark)
    }
    side("purchase", "p").join(side("error", "e"),
      expr("p_user = e_user AND e_ts >= p_ts AND e_ts <= p_ts + INTERVAL 6 HOURS"),
      joinType)
      .select(col("p_user").as("user_id"), col("p_id").as("purchase_id"),
        col("e_id").as("error_id"))
  }

  /** Checkpointed join-to-files — the restart shape a production
    * correlation pipeline runs: join state (buffered unmatched rows on
    * both sides) lives in the checkpoint, so a purchase buffered BEFORE
    * a stop/start still matches an error arriving AFTER it
    * (StreamingSpec pins exactly that), and the parquet sink's
    * transaction log keeps output exactly-once under retry.
    */
  def joinToFiles(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, watermark: String = "10 minutes",
      joinType: String = "inner"): org.apache.spark.sql.streaming.StreamingQuery =
    purchaseErrorJoin(spark, inDir, watermark, None, joinType).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Drain the bounded input and return the joined rows (memory sink;
    * StreamingSpec harness).
    */
  def runToCompletion(spark: SparkSession, dir: String, queryName: String,
      watermark: String = "10 minutes",
      maxFilesPerTrigger: Option[Int] = None,
      joinType: String = "inner"): DataFrame = {
    val q = purchaseErrorJoin(spark, dir, watermark, maxFilesPerTrigger, joinType)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
