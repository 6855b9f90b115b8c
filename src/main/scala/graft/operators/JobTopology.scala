package graft.operators

import graft.{Op, T}
import graft.core.Wire
import graft.ml.Learners
import graft.streaming._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The composed end-to-end Job twin (reference `Job.runOMLDMJob`,
  * Job.scala:35-108 wiring FlinkLearning.scala:33-152): every stage the
  * K-gates prove individually, strung through ONE running topology over a
  * single wire-format stream —
  *
  *   S sources (raw JSON, one staged stream standing in for the request +
  *   training + forecasting Kafka topics, Job.scala:42-57,127-133)
  *   → P parsers route by validity (DataInstanceParser / RequestParser,
  *     the P7 filters: a record parses as exactly one of the two shapes) in
  *     ONE scan of the wire stream — branch-per-destination would read the
  *     ingest firehose once per branch per trigger
  *   → control broadcast ×workers (C2) + per-(pipeline,worker) keying (C3/C7)
  *   → the multi-pipeline spoke: TWO concurrent pipelines (PA classifier +
  *     PA regressor) hosted by the SAME stream, interleaved
  *     Create/data/Query/Delete, pre-Create buffering, duplicate-Create,
  *     invalid-learner and Query-on-missing rejections (the WHOLE catalog —
  *     per-id statefulness AND name validation, PipelineMap.scala:31-47,
  *     66-69 — lives in the keyed state, sharded with the pipeline's
  *     workers, so rejection outcomes count once per shard) — run on the
  *     primary transformWithState/RocksDB path (K1/K2)
  *   → K9 tagged sinks: predictions / worker responses / logs fan out of one
  *     foreachBatch (the reference's side-output → Kafka-topic sinks, O1-O4)
  *   → the K5 exactly-p barrier consumes the response sink AS A STREAM and
  *     releases merged QueryResponses only at parts == workers
  *     (ResponseConstructor.scala:13-69)
  *   → K6 job statistics consume the same worker responses as time-ordered
  *     stat partials: quiescence timer fires terminate_signal, then the
  *     workers×pipelines Terminate barrier releases the per-pipeline finals
  *     (StatisticsOperator.scala:91-131).
  *
  * Stage handoffs ride exactly-once file sinks — the Spark-native stand-in
  * for the reference's Kafka topic boundaries (psMessages/responses/
  * predictions, Job.scala:76-105); SURVEY §3.4 sanctions the substitution.
  * The gate composes the st04/st07/st18 oracles: every count and accounting
  * identity below is recomputed by DuckDB from the embeddings table alone,
  * so a spoke that drops a buffered row, a barrier that releases early, a
  * catalog that mis-routes a rejection, or a stats operator whose timer
  * never fires each flips a pinned row.
  *
  * Scale shape: the wire stream is row-local parse+route (codegen'd
  * from_json, no shuffle until the keyed state op); spoke state is O(hosted
  * pipelines), merge state O(open requests), stats state O(pipelines) — all
  * corpus-size-free; the only per-record shuffle is the keyed exchange into
  * the spoke, the same exchange the reference's partitionCustom does.
  */
object JobTopology {

  private val Workers = 4

  private val spokeSchema = Encoders.product[SpokeEvent].schema

  /** Stage the wire stream: three time-ordered files of raw JSON —
    * (1) 100 pre-Create training instances; (2) the Create round (incl. an
    * invalid-learner Create and a duplicate Create) + the bulk of training;
    * (3) the Query-9 round, forecasting instances, the Query-99 Terminate
    * round, Delete p1, and a post-Delete Query.
    */
  private def stageWire(s: SparkSession, d: String): String =
    Streaming.stagedDir("mljob", d) { dir =>
      import s.implicits._
      val feats = T.embeddings(s, d)
      val n = feats.count()
      def dataJson(rows: DataFrame, op: String) =
        rows.select(to_json(struct(
          col("vec_id").as("id"),
          lit(op).as("operation"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            .as("numericalFeatures"),
          (if (op == "training") col("label").cast(DoubleType)
           else lit(null).cast(DoubleType)).as("target"))).as("value"))
      val reqs2 = Seq(
        """{"id": 1, "request": "Create", "requestId": 1, "learner": {"name": "PA"}}""",
        """{"id": 2, "request": "Create", "requestId": 1, "learner": {"name": "RegressorPA"}}""",
        """{"id": 3, "request": "Create", "requestId": 1, "learner": {"name": "DeepForest"}}""",
        """{"id": 1, "request": "Create", "requestId": 2, "learner": {"name": "SVM"}}""",
        "EOS").toDF("value")
      val reqs3 = Seq(
        """{"id": 1, "request": "Query", "requestId": 9}""",
        """{"id": 2, "request": "Query", "requestId": 9}""",
        """{"id": 1, "request": "Query", "requestId": 99}""",
        """{"id": 2, "request": "Query", "requestId": 99}""",
        """{"id": 1, "request": "Delete", "requestId": 100}""",
        """{"id": 1, "request": "Query", "requestId": 110}""",
        "{not json").toDF("value")
      val f1 = dataJson(feats.filter(col("vec_id") < 100), "training")
      val f2 = reqs2.unionByName(
        dataJson(feats.filter(col("vec_id") >= 100 && col("vec_id") < n - 50),
          "training"))
      val f3 = reqs3.unionByName(
        dataJson(feats.filter(col("vec_id") >= n - 50), "forecasting"))
      // distinct mtimes: the file source orders by modification time
      val t0 = System.currentTimeMillis()
      def backdate(olderThan: Long, to: Long): Unit =
        java.nio.file.Files.list(java.nio.file.Paths.get(dir)).forEach(p =>
          if (java.nio.file.Files.getLastModifiedTime(p).toMillis > olderThan)
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(to)))
      f1.coalesce(1).write.mode("append").parquet(dir)
      backdate(t0 - 120000, t0 - 120000)
      f2.coalesce(1).write.mode("append").parquet(dir)
      backdate(t0 - 120000, t0 - 60000)
      f3.coalesce(1).write.mode("append").parquet(dir)
    }

  /** ONE scan of the wire stream routes everything (the P7 validity
    * filters as disjoint parse-success predicates): each `value` record
    * becomes 0..max(pipelines, workers) envelopes via a codegen'd array
    * build + explode. A branch-per-destination union would scan the ingest
    * firehose once PER BRANCH per trigger — 3x the I/O at 100 TB for the
    * same rows (PlanSuite pins the single-scan shape). Validation (learner
    * names) lives INSIDE the spoke's keyed catalog state, so there is no
    * stateless reject branch at all.
    *
    * Works on any DataFrame with a `value` string column — streaming in
    * Q1, batch in the PlanSuite pin.
    */
  private[graft] def route(raw: DataFrame): org.apache.spark.sql.Dataset[Envelope] = {
    val di = col("__di")
    val rq = col("__rq")
    val diValid = col("value") =!= "EOS" && di.isNotNull &&
      (size(coalesce(di("numericalFeatures"), array())) > 0 ||
        size(coalesce(di("discreteFeatures"), array())) > 0 ||
        size(coalesce(di("categoricalFeatures"), array())) > 0) &&
      (di("operation").isNull ||
        di("operation").isin("training", "forecasting"))
    val rqValid = rq.isNotNull &&
      rq("request").isin("Create", "Update", "Query", "Delete")

    // P1/P3: a data instance fans to every hosted pipeline (the reference
    // spoke trains all hosted pipelines per record); the per-pipeline
    // target shaping is the preprocessor stage (±1 for the classifier,
    // raw for the regressor).
    def dataEnv(pid: Int) = struct(
      when(di("operation") === "forecasting", di("id") + 1100000L)
        .when(di("id") < 100L, di("id"))
        .otherwise(di("id") + 200000L).as("seq"),
      (lit(pid * 1024) + pmod(di("id"), lit(4L)).cast(IntegerType))
        .cast(IntegerType).as("pipelineId"),
      lit("data").as("kind"), lit("").as("reqType"), lit("").as("learner"),
      lit(-1L).as("requestId"), di("id").as("id"),
      concat(
        coalesce(di("numericalFeatures"), array().cast(ArrayType(DoubleType))),
        coalesce(expr("transform(__di.discreteFeatures, x -> CAST(x AS DOUBLE))"),
          array().cast(ArrayType(DoubleType)))).as("features"),
      when(di("operation") === "forecasting", lit(null).cast(DoubleType))
        .otherwise(if (pid == 1)
          when(di("target") >= 5.0, 1.0).otherwise(-1.0)
        else di("target")).as("target"),
      coalesce(di("operation"), lit("training")).as("operation"))

    // P2/K1: a request broadcasts to the pipeline's worker shards (C2).
    def ctrlEnv(w: Int) = struct(
      (rq("requestId") * 100000L).as("seq"),
      (rq("id") * 1024 + w).cast(IntegerType).as("pipelineId"),
      lit("control").as("kind"), rq("request").as("reqType"),
      coalesce(rq("learner")("name"), lit("")).as("learner"),
      coalesce(rq("requestId"), lit(-1L)).as("requestId"),
      lit(-1L).as("id"),
      array().cast(ArrayType(DoubleType)).as("features"),
      lit(null).cast(DoubleType).as("target"),
      lit("").as("operation"))

    // slice(.., 1, 0) yields a typed empty array, so invalid parses
    // contribute zero envelopes and explode drops the record
    raw
      .withColumn("__di", from_json(col("value"), Wire.dataInstanceSchema))
      .withColumn("__rq", from_json(col("value"), Wire.requestSchema))
      .select(explode(concat(
        slice(array(dataEnv(1), dataEnv(2)), lit(1),
          when(diValid, 2).otherwise(0)),
        slice(array((0 until Workers).map(ctrlEnv): _*), lit(1),
          when(rqValid, Workers).otherwise(0)))).as("e"))
      .select(col("e.*"))
      .as[Envelope](Encoders.product[Envelope])
  }

  /** Q1 — the Job: parse + route + validate + expand, spoke, tagged sinks.
    * Returns after the stream drains; outputs land under `out`.
    */
  private def runJob(s: SparkSession, wireDir: String, out: String): Unit = {
    // transformWithState needs the RocksDB provider; isolate in a child
    // session (the st31 pattern) instead of mutating the caller's conf
    val s2 = s.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the documented production default (PLANS.md r10): per-merge row-count
    // maintenance GETs the whole merged value — O(buffer) per ListState
    // append under load
    s2.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
    Streaming.withStreamShuffle(s2) {
      val raw = s2.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .option("maxFilesPerTrigger", "1").parquet(wireDir)
      val spoke = TwsSpoke.run(route(raw)).toDF()

      val q = spoke.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$out/_ckpt_q1")
        .foreachBatch { (b: DataFrame, _: Long) =>
          // K9 side-output fan-out to tagged sinks (O1-O4)
          val bb = b.persist()
          bb.filter(col("kind") === "prediction")
            .write.mode("append").parquet(s"$out/predictions")
          bb.filter(col("kind") === "response")
            .write.mode("append").parquet(s"$out/responses")
          bb.filter(!col("kind").isin("prediction", "response"))
            .write.mode("append").parquet(s"$out/logs")
          bb.unpersist()
          ()
        }
        .start()
      q.processAllAvailable()
      // scale-probe telemetry (P08_TRACE): the spoke's keyed state must stay
      // protocol-sized — O(pipelines x workers) rows, model-sized bytes —
      // regardless of streamed volume; lastProgress carries the state
      // operator's row/byte ledger for the final commit
      if (sys.env.contains("P08_TRACE")) {
        val p = q.lastProgress
        if (p != null) p.stateOperators.foreach(so =>
          println(s"P08 state rows=${so.numRowsTotal} " +
            s"memBytes=${so.memoryUsedBytes} " +
            s"commitMs=${so.commitTimeMs}"))
      }
      q.stop()
    }
  }

  /** Decode spoke response rows into the K5 input shape (shared by the
    * batch gate read and Q2's streaming read).
    */
  private def respProjection(df: DataFrame): DataFrame =
    df.filter(col("kind") === "response")
      .select(
        expr("pipelineId DIV 1024").cast(IntegerType).as("pipe"),
        pmod(col("pipelineId"), lit(1024)).cast(IntegerType).as("worker"),
        col("requestId"),
        regexp_extract(col("info"), "fitted=(\\d+)", 1).cast(LongType).as("fitted"),
        regexp_extract(col("info"), "testn=(\\d+)", 1).cast(LongType).as("testn"),
        col("value").as("loss"),
        regexp_extract(col("info"), "score=([^,]+)", 1).cast(DoubleType).as("score"))

  /** Worker responses as read back off the response sink. */
  private def workerResponses(s: SparkSession, out: String): DataFrame =
    respProjection(s.read.schema(spokeSchema).parquet(s"$out/responses"))

  /** Q2 — the K5 barrier over the response sink, as a stream. Returns the
    * STARTED query: Q2 and Q3 are independent consumers of the spoke's
    * output, exactly the reference DAG's parallel queryResponses /
    * performance branches (FlinkLearning.scala:104-135), so the caller
    * runs them concurrently and awaits both.
    */
  private def startMerge(s: SparkSession, out: String, name: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import s.implicits._
    Streaming.withStreamShuffle(s) {
      val wr = respProjection(
        s.readStream.schema(spokeSchema).parquet(s"$out/responses"))
        .as[WorkerResponse]
      ResponseMerge.run(wr, Workers).writeStream
        .format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$out/_ckpt_q2")
        .start()
    }
  }

  /** Q3 — K6 job statistics: the worker responses become time-ordered stat
    * partials (the hub's (String, Statistics) stream); two watermark-only
    * sentinel files stand in for quiet event time so the quiescence timer
    * fires terminate_signal BEFORE the Terminate partials arrive; the
    * workers×pipelines barrier then releases the finals.
    */
  private def startStats(s: SparkSession, out: String, name: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import s.implicits._
    val resp = workerResponses(s, out)
    val statsP = resp.filter(col("requestId") === 9L)
      .select(lit("stats").as("tag"), col("pipe").as("pipelineId"), col("worker"),
        lit(1L).as("modelsShipped"), (col("testn") * 8L).as("bytesShipped"),
        col("fitted"), lit(0.0).as("meanBufferSize"), lit(0.0).as("score"),
        (lit(1000L) + (col("worker") * 2L + col("pipe") - 1L) * 500L)
          .as("eventTimeMs"))
    val termP = resp.filter(col("requestId") === 99L)
      .select(lit("Terminate").as("tag"), col("pipe").as("pipelineId"), col("worker"),
        lit(0L).as("modelsShipped"), lit(0L).as("bytesShipped"),
        lit(0L).as("fitted"), col("testn").cast(DoubleType).as("meanBufferSize"),
        // ABOVE the sentinel watermark (10,000,000): fMGWS drops late input
        // rows once a watermark is attached, and the Terminate round really
        // does happen after the quiescence signal in the reference's clock.
        // The Terminate branch never touches start/end timestamps, so the
        // makespan stays pinned by the stats partials alone.
        col("score"), (lit(20000000L) + col("worker")).as("eventTimeMs"))
    def sentinel(ts: Long) = Seq(
      StatPartial("__wm__", 0, -1, 0L, 0L, 0L, 0.0, 0.0, ts)).toDF()
    val statsDir = s"$out/stat_partials"
    val t0 = System.currentTimeMillis()
    def backdate(olderThan: Long, to: Long): Unit =
      java.nio.file.Files.list(java.nio.file.Paths.get(statsDir)).forEach(p =>
        if (java.nio.file.Files.getLastModifiedTime(p).toMillis > olderThan)
          java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(to)))
    statsP.coalesce(1).write.mode("append").parquet(statsDir)
    backdate(t0 - 180000, t0 - 180000)
    sentinel(10000000L).coalesce(1).write.mode("append").parquet(statsDir)
    backdate(t0 - 180000, t0 - 120000)
    sentinel(10000001L).coalesce(1).write.mode("append").parquet(statsDir)
    backdate(t0 - 120000, t0 - 60000)
    termP.coalesce(1).write.mode("append").parquet(statsDir)
    Streaming.withStreamShuffle(s) {
      val src = s.readStream.schema(Encoders.product[StatPartial].schema)
        .option("maxFilesPerTrigger", "1").parquet(statsDir).as[StatPartial]
      JobStatsOperator.run(src, workers = Workers, testSetSize = 256,
        timeoutMs = 60000L, wmOnlyTag = "__wm__").writeStream
        .format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$out/_ckpt_q3")
        .start()
    }
  }

  val ops: Seq[Op] = Seq(
    Op("p08_ml_job_topology", (s, d) => {
      val wireDir = stageWire(s, d)
      val out = Streaming.scratchDir("mljob_out_")
      val n = T.embeddings(s, d).count()
      val nTrain = n - 50L

      def tlog[A](tag: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        if (sys.env.contains("P08_TRACE"))
          println(f"P08 $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      tlog("q1_job")(runJob(s, wireDir, out))
      val runTag = java.util.UUID.randomUUID().toString.replace("-", "")
      // Q2 and Q3 run CONCURRENTLY — the reference DAG's parallel
      // queryResponses/performance branches off the worker stream
      val (merged, jobStats) = tlog("q2q3_merge_stats") {
        val q2 = startMerge(s, out, s"p08m_$runTag")
        val q3 = startStats(s, out, s"p08s_$runTag")
        q2.processAllAvailable(); q3.processAllAvailable()
        q2.stop(); q3.stop()
        (s.table(s"p08m_$runTag"), s.table(s"p08s_$runTag"))
      }

      // ---- gate assembly: one pinned row per composed behavior ----
      val catalogRows = s.read.schema(spokeSchema).parquet(s"$out/logs")
        .filter(col("kind") === "log")
        .withColumn("item",
          when(col("info").startsWith("create_rejected:invalid"),
            lit("create_rejected:invalid")).otherwise(col("info")))
        .groupBy("item")
        .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"))
        .select(lit("catalog").as("stage"), col("item"), col("n_rows"),
          // the 8 drain logs carry the 100 pre-Create rows x 2 pipelines
          when(col("item") === "created:drained", col("sum_value") === 200.0)
            .otherwise(lit(true)).as("ok"))

      val predRows = s.read.schema(spokeSchema).parquet(s"$out/predictions")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("id").as("n_ids"),
          min("id").as("min_id"), max("id").as("max_id"),
          min("requestId").as("min_req"), max("requestId").as("max_req"),
          sum(when(expr("pipelineId DIV 1024") === 1, 1L).otherwise(0L)).as("n_p1"),
          sum(when(col("value").isNull || isnan(col("value")), 1L)
            .otherwise(0L)).as("bad"))
        .select(lit("predictions").as("stage"), lit("all").as("item"),
          col("n_rows"),
          (col("n_ids") === 50L && col("min_id") === lit(n - 50L) &&
            col("max_id") === lit(n - 1L) &&
            col("min_req") === -1L && col("max_req") === -1L &&
            col("n_p1") === 50L && col("bad") === 0L).as("ok"))

      val wrRows = workerResponses(s, out)
        .groupBy("requestId", "pipe")
        .agg(count(lit(1)).as("parts"),
          (sum("fitted") + sum("testn")).as("acc"),
          sum(when(col("loss").isNull || isnan(col("loss")) ||
            col("loss") < 0.0, 1L).otherwise(0L)).as("bad_loss"))
        .groupBy("requestId")
        .agg(sum("parts").as("n_rows"),
          bool_and(col("parts") === Workers && col("acc") === nTrain &&
            col("bad_loss") === 0L).as("ok"))
        .select(lit("worker_responses").as("stage"),
          concat(lit("req"), col("requestId")).as("item"),
          col("n_rows"), col("ok"))

      val mergedRows = merged
        .select(lit("merged").as("stage"),
          concat(lit("p"), col("pipe"), lit("_req"), col("requestId")).as("item"),
          lit(1L).as("n_rows"),
          (col("parts") === Workers &&
            col("fitted") + col("testn") === nTrain &&
            col("avgLoss") >= 0.0 && !isnan(col("avgLoss")) &&
            when(col("pipe") === 1,
              col("avgScore") >= 0.0 && col("avgScore") <= 1.0)
              .otherwise(col("avgScore") <= 0.0 && !isnan(col("avgScore"))))
            .as("ok"))

      val signalRow = jobStats.filter(col("kind") === "terminate_signal")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("job_stats").as("stage"), lit("terminate_signal").as("item"),
          col("n_rows"), (col("n_rows") === 1L).as("ok"))

      val finalRows = jobStats.filter(col("kind") === "job_statistics_final")
        .select(lit("job_stats").as("stage"),
          concat(lit("final_p"), col("pipelineId")).as("item"),
          lit(1L).as("n_rows"),
          (regexp_extract(col("info"), "makespan=(\\d+)", 1) === "3500" &&
            regexp_extract(col("info"), "partials=(\\d+)", 1)
              .cast(LongType) === Workers.toLong &&
            regexp_extract(col("info"), "models=(\\d+)", 1)
              .cast(LongType) === Workers.toLong &&
            regexp_extract(col("info"), "fitted=(\\d+)", 1).cast(LongType) +
              regexp_extract(col("info"), "meanBuffer=([^,]+)", 1)
                .cast(DoubleType) * Workers === nTrain.toDouble &&
            when(col("pipelineId") === 1,
              col("value") >= 0.0 && col("value") <= 1.0)
              .otherwise(col("value") <= 0.0 && !isnan(col("value"))))
            .as("ok"))

      catalogRows
        .unionByName(predRows)
        .unionByName(wrRows)
        .unionByName(mergedRows)
        .unionByName(signalRow)
        .unionByName(finalRows)
        .orderBy("stage", "item")
    },
      Some("""SELECT * FROM (VALUES
        |  ('catalog', 'create_rejected:exists', CAST(4 AS BIGINT), true),
        |  ('catalog', 'create_rejected:invalid', CAST(4 AS BIGINT), true),
        |  ('catalog', 'created:drained', CAST(8 AS BIGINT), true),
        |  ('catalog', 'deleted', CAST(4 AS BIGINT), true),
        |  ('catalog', 'query_rejected:missing', CAST(4 AS BIGINT), true),
        |  ('job_stats', 'final_p1', CAST(1 AS BIGINT), true),
        |  ('job_stats', 'final_p2', CAST(1 AS BIGINT), true),
        |  ('job_stats', 'terminate_signal', CAST(1 AS BIGINT), true),
        |  ('merged', 'p1_req9', CAST(1 AS BIGINT), true),
        |  ('merged', 'p1_req99', CAST(1 AS BIGINT), true),
        |  ('merged', 'p2_req9', CAST(1 AS BIGINT), true),
        |  ('merged', 'p2_req99', CAST(1 AS BIGINT), true),
        |  ('predictions', 'all', CAST(100 AS BIGINT), true),
        |  ('worker_responses', 'req9', CAST(8 AS BIGINT), true),
        |  ('worker_responses', 'req99', CAST(8 AS BIGINT), true)
        |) t(stage, item, n_rows, ok)
        |ORDER BY stage, item""".stripMargin))
  )
}
