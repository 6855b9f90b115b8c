package graft

import graft.streaming._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Spoke state-machine semantics, driven through the same `process` function
  * the streaming query uses (TestGroupState is Spark's public harness for
  * exactly this).
  */
class StreamingSuite extends AnyFunSuite {

  private def data(seq: Long, id: Long, y: Option[Double], op: String = "training") =
    Envelope(seq, 1, "data", "", "", -1L, id, Seq(1.0, 2.0, 3.0), y, op)
  private def ctl(seq: Long, req: String, learner: String = "", reqId: Long = 1L) =
    Envelope(seq, 1, "control", req, learner, reqId, -1, Nil, None, "")

  private def fresh(): TestGroupState[SpokeState] =
    TestGroupState.create[SpokeState](
      org.apache.spark.api.java.Optional.empty[SpokeState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

  test("pre-Create data buffers, Create drains it into training") {
    val st = fresh()
    val out = Spoke.process(1, Iterator(
      data(0, 10, Some(1.0)), data(1, 11, Some(-1.0)),
      ctl(2, "Create", "PA")), st).toSeq
    val log = out.find(_.kind == "log").get
    assert(log.info == "created:drained" && log.value == 2.0)
    assert(st.exists)
    // next trigger: more training + query reflects all 3 fits
    val out2 = Spoke.process(1, Iterator(
      data(10, 12, Some(1.0)), ctl(11, "Query", reqId = 9L)), st).toSeq
    val resp = out2.find(_.kind == "response").get
    assert(resp.info == "fitted=3", resp.info)
    assert(resp.requestId == 9L)
  }

  test("forecasting points yield predictions; Delete clears state") {
    val st = fresh()
    Spoke.process(1, Iterator(ctl(0, "Create", "PA"),
      data(1, 20, Some(1.0)), data(2, 21, Some(1.0))), st)
      .foreach(_ => ())
    val out = Spoke.process(1, Iterator(
      data(10, 30, None, "forecasting"), ctl(11, "Delete")), st).toSeq
    assert(out.count(_.kind == "prediction") == 1)
    assert(out.exists(e => e.kind == "log" && e.info == "deleted"))
    val out2 = Spoke.process(1, Iterator(ctl(20, "Query", reqId = 2L)), st).toSeq
    assert(out2.head.info == "fitted=0")
  }

  test("within-trigger events replay in seq order regardless of iterator order") {
    val st = fresh()
    // Create has lower seq than the data — must apply first even though the
    // iterator delivers it last
    val out = Spoke.process(1, Iterator(
      data(5, 10, Some(1.0)), data(6, 11, Some(1.0)), ctl(0, "Create", "PA")), st).toSeq
    assert(out.find(_.kind == "log").get.value == 0.0) // nothing buffered
    val out2 = Spoke.process(1, Iterator(ctl(10, "Query")), st).toSeq
    assert(out2.head.info == "fitted=2")
  }
}
