package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Scratch probe for the st44 Job capstone: can Spark 4.1 chain THREE keyed
  * stateful operators (spoke-like fMGWS -> merge fMGWS -> event-time-timeout
  * fMGWS) inside ONE streaming query? Not part of the library surface.
  */
object JobProbe {
  case class In(k: Int, v: Long, eventTime: java.sql.Timestamp)
  case class Mid(k: Int, sum: Long, tsMs: Long)
  case class Fin(k: Int, total: Long)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("jobprobe_").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    Seq(In(1, 5L, ts(1000)), In(2, 7L, ts(2000)))
      .toDS().coalesce(1).write.mode("append").parquet(dir)
    val past = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 60000)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).forEach(p =>
      java.nio.file.Files.setLastModifiedTime(p, past))
    Seq(In(1, 11L, ts(100000)), In(2, 13L, ts(200000)),
        In(1, 0L, ts(90000000)))
      .toDS().coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[In]].schema)
      .option("maxFilesPerTrigger", "1").parquet(dir).as[In]
      .withWatermark("eventTime", "0 seconds")

    // stage 1: spoke-like pass-through accumulator (NoTimeout fMGWS)
    val mid: Dataset[Mid] = src.groupByKey(_.k)
      .flatMapGroupsWithState[Long, Mid](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (k: Int, it: Iterator[In], st: GroupState[Long]) =>
          val rows = it.toSeq
          val s2 = st.getOption.getOrElse(0L) + rows.map(_.v).sum
          st.update(s2)
          rows.map(r => Mid(k, s2, r.eventTime.getTime)).iterator
      }

    // stage 2: merge-like fMGWS (NoTimeout)
    val merged: Dataset[Mid] = mid.groupByKey(_.k)
      .flatMapGroupsWithState[Long, Mid](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (k: Int, it: Iterator[Mid], st: GroupState[Long]) =>
          val rows = it.toSeq
          val s2 = math.max(st.getOption.getOrElse(0L), rows.map(_.sum).max)
          st.update(s2)
          rows.map(r => Mid(k, s2, r.tsMs)).iterator
      }

    // stage 3: event-time-timeout quiescence (re-watermark on the
    // intermediate's own timestamp column — the watermark tag does not
    // survive a fMGWS stage)
    val fin: Dataset[Fin] = merged
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", "0 seconds")
      .drop("eventTime").as[Mid]
      .groupByKey(_.k)
      .flatMapGroupsWithState[Mid, Fin](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (k: Int, it: Iterator[Mid], st: GroupState[Mid]) =>
          if (st.hasTimedOut) {
            val v = st.get; st.remove()
            Iterator.single(Fin(k, v.sum))
          } else {
            val rows = it.toSeq
            if (rows.isEmpty) Iterator.empty
            else {
              val last = rows.maxBy(_.tsMs)
              st.update(last)
              val wm = scala.util.Try(st.getCurrentWatermarkMs).getOrElse(0L)
              st.setTimeoutTimestamp(math.max(last.tsMs + 30000L, wm + 1))
              Iterator.empty
            }
          }
      }

    try {
      val q = fin.writeStream.format("memory").queryName("jobprobe")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/_ckpt")
        .start()
      q.processAllAvailable(); q.stop()
      println("CHAIN-OK rows=" +
        spark.table("jobprobe").collect().mkString(";"))
    } catch {
      case e: Throwable =>
        println(s"CHAIN-FAIL ${e.getClass.getName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
