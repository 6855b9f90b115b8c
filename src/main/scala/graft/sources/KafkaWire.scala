package graft.sources

import graft.core.Wire
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka wiring for the reference's topics (KafkaUtils.scala:20-52,
  * Job.scala:42-57,127-142) — thin factories over `readStream`/`writeStream`
  * options, exactly the S1–S4/O1–O4 mapping of SURVEY §2.
  *
  * This container ships neither a broker nor the spark-sql-kafka connector
  * (zero egress), so the format cannot be executed here; everything around
  * it is factored to be testable without one and covered by KafkaWireSuite:
  * the consumer/producer option maps ([[sourceOptions]]/[[sinkOptions]]),
  * the P5 metadata+payload projection over the connector's wire schema
  * ([[decodeRaw]], driven by mocked Kafka-shaped record batches), and the
  * parse compositions ([[pointsFromDecoded]]/[[requestsFromDecoded]]). The
  * `format("kafka")` call itself is the only untested line per factory.
  */
object KafkaWire {

  /** Consumer options of the reference's training/forecasting/requests
    * consumers (earliest offsets, one topic each).
    */
  def sourceOptions(bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  /** Producer options for the psMessages/predictions/responses/performance
    * topics.
    */
  def sinkOptions(bootstrap: String, topic: String,
      checkpoint: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "checkpointLocation" -> checkpoint)

  /** P5: project the Kafka connector's wire schema (binary key/value +
    * topic/partition/offset/timestamp metadata) into the engine's decoded
    * record shape. Pure column logic — testable on mocked batches.
    */
  def decodeRaw(raw: DataFrame): DataFrame =
    raw.select(col("value").cast("string").as("value"), col("topic"),
      col("partition"), col("offset"), col("timestamp"),
      col("key").cast("string").as("key"))

  /** P1 + P3 over a decoded record stream: training/forecasting points. */
  def pointsFromDecoded(decoded: DataFrame): DataFrame =
    Wire.toPoints(Wire.parseInstances(decoded, "value"))

  /** P2 over a decoded record stream: control requests. */
  def requestsFromDecoded(decoded: DataFrame): DataFrame =
    Wire.parseRequests(decoded, "value")

  /** S1/S2/S3: string consumer on a topic; earliest offsets like the
    * reference's training/forecasting/requests consumers.
    */
  def stringSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    decodeRaw(spark.readStream.format("kafka")
      .options(sourceOptions(bootstrap, topic, startingOffsets))
      .load())

  /** S1 + P1 + P3 composed: training/forecasting points from a topic. */
  def pointsSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    pointsFromDecoded(stringSource(spark, bootstrap, topic))

  /** S3 + P2 composed: control requests from the requests topic. */
  def requestsSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    requestsFromDecoded(stringSource(spark, bootstrap, topic))

  /** O1–O4: produce output records (Prediction / QueryResponse /
    * JobStatistics rows) to a topic as JSON values; `keyCol` drives Kafka
    * partitioning like the reference's custom partitioners (C8).
    */
  def jsonSink(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String, keyCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val records = graft.core.Sinks.toJsonRecords(df, keyCol)
    records.writeStream.format("kafka")
      .options(sinkOptions(bootstrap, topic, checkpoint))
  }
}
