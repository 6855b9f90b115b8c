package graft.operators

import graft.{Op, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (most-recent-event) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the build guidance): tag and
  * union both sides, then a single partition-by-key sort and
  * `last(_, ignoreNulls)` window carries the latest right-hand row forward
  * onto each left-hand row. One shuffle + one sort, no join explosion, no
  * per-key collect — at 100 TB this is strictly cheaper than the
  * join+filter+row_number alternative (which materializes every candidate
  * pair before pruning). The right payload rides in a single struct column so
  * all attached fields always come from the same right row.
  */
object AsOf {

  /** Left as-of join: for each left row, attach the right row with the
    * greatest `rightTime <= leftTime` within the same key; ties on
    * `rightTime` resolved by the greatest `tieBreak` column.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: Column, rightTime: Column,
      rightCols: Seq[String],
      tieBreak: String): DataFrame = {
    val payloadType = StructType(rightCols.map(c => right.schema(c).copy(name = c)))
    val lTagged = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", leftTime.cast(TimestampType))
      .withColumn("__isLeft", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    val rTagged = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", rightTime.cast(TimestampType))
      .withColumn("__isLeft", lit(0))
      .withColumn("__r", struct(rightCols.map(col): _*))
      .select((Seq("__k", "__t", "__isLeft", "__r").map(col) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = lTagged.select(rTagged.columns.toIndexedSeq.map(col): _*).unionByName(rTagged)
    // Right rows sort before left rows at equal time (<= semantics); among
    // right rows with equal time the greatest tieBreak lands nearest the
    // left row, so `last(ignoreNulls)` picks it. Left rows carry a null
    // tie-break and sort first within their (time, side) slot, which is
    // irrelevant since sides differ.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isLeft"), col("__r").getField(tieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__isLeft") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }

  val ops: Seq[Op] = Seq(
    Op(
      "q17_asof_join",
      (s, d) => {
        val e = T.events(s, d)
        val o = T.orders(s, d)
        asofJoin(
          left = e.select("event_id", "user_id", "ts"),
          right = o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = col("ts"),
          rightTime = col("o_orderdate"),
          rightCols = Seq("o_orderkey", "o_orderdate"),
          tieBreak = "o_orderkey")
          .select(col("event_id"), col("user_id"), col("o_orderkey"),
            col("o_orderdate").cast(DateType).as("o_orderdate"))
          .orderBy("event_id")
      },
      // All fixture orders predate all fixture events, so "latest order with
      // o_orderdate <= ts" degenerates to "latest order per customer" — the
      // Spark side still evaluates full as-of semantics.
      Some("""SELECT e.event_id, e.user_id, o.o_orderkey,
        |  CAST(o.o_orderdate AS DATE) AS o_orderdate
        |FROM events e
        |LEFT JOIN (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |           FROM orders) o
        |  ON o.o_custkey = e.user_id AND o.rn = 1
        |ORDER BY e.event_id""".stripMargin)),
  )
}
