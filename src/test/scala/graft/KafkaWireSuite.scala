package graft

import graft.sources.KafkaWire
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mocked-Kafka-shape coverage of the S1–S4/C8/O1–O4 plumbing: the container
  * has no broker and no spark-sql-kafka connector, so the `format("kafka")`
  * line itself cannot execute here; everything else — consumer/producer
  * option maps, the P5 wire-schema projection, and the parse compositions —
  * is exercised on record batches with the connector's exact output schema.
  */
class KafkaWireSuite extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** The spark-sql-kafka source's fixed output schema. */
  private val kafkaWireSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def mockBatch(records: Seq[(String, String)]) = {
    val rows = records.zipWithIndex.map { case ((k, v), i) =>
      Row(if (k == null) null else k.getBytes("UTF-8"), v.getBytes("UTF-8"),
        "training_data", i % 4, i.toLong,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), kafkaWireSchema)
  }

  test("consumer options match the reference's earliest-offset subscribers") {
    val opts = KafkaWire.sourceOptions("broker:9092", "trainingDataTopic")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "trainingDataTopic")
    assert(opts("startingOffsets") == "earliest")
    assert(KafkaWire.sourceOptions("b", "t", "latest")("startingOffsets") == "latest")
  }

  test("producer options carry topic + checkpoint for exactly-once sinks") {
    val opts = KafkaWire.sinkOptions("broker:9092", "predictionsTopic", "/ckpt")
    assert(opts("topic") == "predictionsTopic")
    assert(opts("checkpointLocation") == "/ckpt")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
  }

  test("P5 projection decodes payload + metadata from the Kafka wire schema") {
    val decoded = KafkaWire.decodeRaw(mockBatch(Seq(
      ("k1", """{"id": 1}"""), (null, "EOS")))).collect()
    assert(decoded.length == 2)
    val byOffset = decoded.map(r => r.getAs[Long]("offset") -> r).toMap
    assert(byOffset(0L).getAs[String]("value") == """{"id": 1}""")
    assert(byOffset(0L).getAs[String]("key") == "k1")
    assert(byOffset(0L).getAs[String]("topic") == "training_data")
    assert(byOffset(1L).getAs[String]("key") == null) // unkeyed record
  }

  test("S1+P1+P3: training points parse out of mocked Kafka records") {
    val pts = KafkaWire.pointsFromDecoded(KafkaWire.decodeRaw(mockBatch(Seq(
      (null, """{"id": 7, "operation": "training", "numericalFeatures": [1.0, 2.0], "target": 1.0}"""),
      (null, """{"id": 8, "operation": "forecasting", "discreteFeatures": [3]}"""),
      (null, "EOS"),
      (null, "{not json"))))).collect()
    assert(pts.length == 2) // EOS + malformed dropped (P7 validity filter)
    val train = pts.find(_.getAs[Long]("id") == 7L).get
    assert(train.getSeq[Double](train.fieldIndex("features")) == Seq(1.0, 2.0))
    assert(pts.exists(_.getAs[String]("operation") == "forecasting"))
  }

  test("S3+P2: control requests parse out of mocked Kafka records") {
    val reqs = KafkaWire.requestsFromDecoded(KafkaWire.decodeRaw(mockBatch(Seq(
      (null,
        """{"id": 1, "request": "Create", "learner": {"name": "PA", "hyperParameters": {"C": 0.01}}, "protocol": "Asynchronous"}"""),
      (null, "EOS"))))).collect()
    assert(reqs.length == 1)
    assert(reqs.head.getAs[String]("request") == "Create")
  }

  test("C8: keyed JSON records expose the partitioning key column") {
    import spark.implicits._
    val preds = Seq(graft.core.Prediction(1, 10L, 1.5),
      graft.core.Prediction(2, 11L, -0.5)).toDF()
    val keyed = graft.core.Sinks.toJsonRecords(preds, Some("pipelineId")).collect()
    assert(keyed.forall(r => r.getAs[String]("key") != null))
    assert(keyed.map(_.getAs[String]("key")).toSet == Set("1", "2"))
    val unkeyed = graft.core.Sinks.toJsonRecords(preds, None).columns.toSeq
    assert(unkeyed.contains("value"))
  }
}
