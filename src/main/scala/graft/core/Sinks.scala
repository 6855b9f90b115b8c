package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Output sinks (SURVEY §2.5 O1–O4): the reference writes stringified
  * Prediction / QueryResponse / JobStatistics records to Kafka topics; here
  * the same record shapes serialize with `to_json` to any Spark sink
  * (files in this container; `format("kafka")` on a real deployment — the
  * code path is identical, only the sink format string changes).
  */
object Sinks {

  /** Serialize every row to a single JSON `value` column, the Kafka-producer
    * record shape (key optional).
    */
  def toJsonRecords(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val value = to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value")
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value)
      case None => df.select(value)
    }
  }

  /** Write a batch of output records as JSON-lines files (Kafka stand-in);
    * one JSON record per line, as a Kafka consumer would see them.
    */
  def writeJson(df: DataFrame, path: String): Unit =
    toJsonRecords(df, None).write.mode("overwrite").text(path)

  /** Read a JSON-lines sink back through the wire parser — round-trip used
    * by tests to prove sink/parser symmetry.
    */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
