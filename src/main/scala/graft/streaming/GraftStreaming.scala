package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY.md §2.11: absent in the reference,
  * built Spark-native as an extension axis): watermarked event-time
  * windows, streaming dedup, and stateful counters over the `events`
  * schema. readStream → transform → writeStream; state lives in Spark's
  * checkpointed state store, not the driver. */
object GraftStreaming {

  /** events.parquet schema with ts as LongType nanos (see nanosAsLong). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based event stream from a directory of parquet drops. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumn("event_time", eventTime(col("ts")))

  /** Stream a single table out of a directory holding several (file
    * streams require a directory source). */
  def readEventsGlob(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
      .withColumn("event_time", eventTime(col("ts")))

  /** ns→event time via exact integer division: a double `/1e9` has ~128 ns
    * of rounding error at 2e18 ns epoch values. Second truncation never
    * moves an event across a window boundary at >=1s window granularity. */
  def eventTime(tsNanos: Column): Column =
    timestamp_seconds((tsNanos / lit(1000000000L)).cast("long"))

  /** Sliding event-time windowed aggregation with a watermark: per
    * (window, event_type) counts and decimal-exact value sums. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     window_ : String = "5 minutes",
                     slide: String = null): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_,
        Option(slide).getOrElse(window_)), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))

  /** Streaming exact dedup on a key within the watermark horizon — the
    * streaming face of Dedup.exact (state pruned by event time). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols :+ "event_time")

  /** Drive a stream to completion against a memory sink (test/local
    * harness): returns the materialized table name. */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.outputMode(outputMode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
