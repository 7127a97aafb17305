package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkFunSuite {
  import EventStreams._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("windowed counts over a memory stream match the batch replay") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 1.0),
      Event(4, ts(75), 2, "click", 3.0),
      Event(5, ts(400), 1, "view", 1.0) // advances watermark past the first windows
    )
    input.addData(events: _*)
    val q = windowedCounts(input.toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    q.processAllAvailable()
    input.addData(Event(6, ts(900), 3, "view", 1.0)) // push watermark further
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("wc")
      .select(col("window_start"), col("event_type"), col("events"), col("total_value"))
      .collect().map(_.toSeq).toSet
    val batch = windowedCountsBatch(events.toDF(), "1 minute")
      .collect().map(_.toSeq).toSet
    // streamed emits only watermark-closed windows; all of those must match batch
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streamed=$streamed batch=$batch")
  }

  test("sessionization closes sessions on gap and aggregates correctly") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // user 1: two events 10s apart (one session), then 500s silence -> closed
    input.addData(
      Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(10), 1, "a", 2.0)
    )
    q.processAllAvailable()
    input.addData(Event(3, ts(500), 1, "a", 5.0)) // new session + watermark advance
    q.processAllAvailable()
    input.addData(Event(4, ts(2000), 2, "b", 1.0)) // advance watermark to flush timeouts
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess").as[Session].collect()
    val first = sessions.find(x => x.user_id == 1L && x.events == 2L)
    assert(first.isDefined, s"expected closed 2-event session, got ${sessions.toSeq}")
    assert(first.get.totalValue === 3.0)
    assert(first.get.start === ts(0) && first.get.end === ts(10))
  }
}
