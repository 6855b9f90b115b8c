package graft.sources

import graft.core.Wire
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka wiring for the reference's topics (KafkaUtils.scala:20-52,
  * Job.scala:42-57,127-142) — thin factories over `readStream`/`writeStream`
  * options, exactly the S1–S4/O1–O4 mapping of SURVEY §2. This container has
  * no Kafka broker (zero egress), so these paths are exercised indirectly:
  * every transformation between source and sink runs in the gate queries
  * against file/memory sources with identical record shapes; only the
  * format string differs.
  */
object KafkaWire {

  /** S1/S2/S3: string consumer on a topic; earliest offsets like the
    * reference's training/forecasting/requests consumers.
    */
  def stringSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      // P5: Kafka metadata columns come with the source; the payload is the
      // JSON value string
      .select(col("value").cast("string").as("value"), col("topic"),
        col("partition"), col("offset"), col("timestamp"),
        col("key").cast("string").as("key"))

  /** S1 + P1 + P3 composed: training/forecasting points from a topic. */
  def pointsSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    Wire.toPoints(Wire.parseInstances(
      stringSource(spark, bootstrap, topic), "value"))

  /** S3 + P2 composed: control requests from the requests topic. */
  def requestsSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    Wire.parseRequests(stringSource(spark, bootstrap, topic), "value")

  /** O1–O4: produce output records (Prediction / QueryResponse /
    * JobStatistics rows) to a topic as JSON values; `keyCol` drives Kafka
    * partitioning like the reference's custom partitioners (C8).
    */
  def jsonSink(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String, keyCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val records = graft.core.Sinks.toJsonRecords(df, keyCol)
    records.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
  }
}
