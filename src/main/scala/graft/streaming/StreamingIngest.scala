package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.ImageTable

/**
 * Structured-Streaming ingest: continuous geocode+tile of newly arriving
 * image files — the "minutely update stream" the reference left as an
 * unimplemented roadmap item (README.md:95-98). The file source's tracked
 * offsets + checkpoint give exactly-once per input file: the streaming
 * analogue of the batch SnapshotLog resume ledger.
 */
object StreamingIngest {

  /** Schema of the raw images table (input_hint). */
  val imagesSchema: StructType = StructType(Seq(
    StructField("image_id", StringType), StructField("bytes", BinaryType),
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("fmt", StringType), StructField("caption", StringType),
    StructField("phash", LongType)))

  /** Micro-batch geocoded ingest: srcDir (parquet files arriving over time)
    * -> derive cells/tiles -> partitioned parquet. Trigger.AvailableNow
    * drains everything currently present and stops — callable per "minute".
    */
  def ingestOnce(spark: SparkSession, srcDir: String, destDir: String,
                 checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream.schema(imagesSchema).parquet(srcDir)
    ImageTable.derive(stream)
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("p_cell")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Windowed per-tile arrival statistics over an event-time stream with a
    * watermark — the streaming counterpart of the tile histogram. Emits
    * (window, cell, n) in append mode once the watermark passes. */
  def tileCounts(events: DataFrame, tsCol: String = "ts",
                 watermark: String = "10 minutes",
                 window: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
               col("cell"))
      .agg(count(lit(1)).as("n"))
}
