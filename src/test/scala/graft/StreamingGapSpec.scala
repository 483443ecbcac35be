package graft

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.Streaming
import graft.streaming.Streaming.{Ev, GapOut, GapState}

/** Multi-batch delivery contract of the gap detector: gaps must emit
  * between TRUE consecutive events even when a later micro-batch
  * delivers an earlier (within-watermark) timestamp — the round-8
  * newest-event-only state compared against the newest event and got
  * this wrong (it was saved only by the replay harness's single-batch
  * delivery). TestGroupState drives [[Streaming.gapEmit]] through the
  * exact cross-batch interleaving the file replay cannot produce. */
class StreamingGapSpec extends SparkSpec {

  private val H = 3600L * 1000L // one hour in ms
  private def ev(id: Long, hours: Long): Ev =
    Ev(id, new Timestamp(hours * H), 7L, "click", 0.0)

  private def mkState(prev: scala.Option[GapState], wmMs: Long, timedOut: Boolean) =
    TestGroupState.create[GapState](
      prev.map(Optional.of[GapState]).getOrElse(Optional.empty[GapState]()),
      GroupStateTimeout.EventTimeTimeout, 1L,
      Optional.of(wmMs), timedOut)

  test("gapEmit: out-of-order cross-batch event pairs with its true predecessor") {
    // batch 1: t=0h and t=50h arrive together, watermark still 0 —
    // nothing is sealed, nothing may emit yet (the old code emitted a
    // wrong 0→50h gap here)
    val s1 = mkState(None, wmMs = 0L, timedOut = false)
    val out1 = Streaming.gapEmit(7L, Iterator(ev(1, 0), ev(2, 50)), s1).toList
    assert(out1.isEmpty, s"nothing is watermark-sealed yet; got $out1")
    assert(s1.get.buf.length == 2 && !s1.get.hasSealed)

    // batch 2: t=30h arrives LATER but is earlier than 50h and above
    // the watermark (legal). Watermark moved to 10h → only t=0 seals.
    val s2 = mkState(Some(s1.get), wmMs = 10 * H, timedOut = false)
    val out2 = Streaming.gapEmit(7L, Iterator(ev(3, 30)), s2).toList
    assert(out2.isEmpty, s"single sealed event has no pair; got $out2")
    assert(s2.get.hasSealed && s2.get.sealedUs == 0L && s2.get.buf.map(_._1) ==
      List(30 * H * 1000L, 50 * H * 1000L), s"state ${s2.get}")

    // batch 3: timeout with the watermark far ahead → the rest seals in
    // true order: 0→30h (30h > 24h, emits), 30h→50h (20h, silent).
    val s3 = mkState(Some(s2.get), wmMs = 100 * H, timedOut = true)
    val out3 = Streaming.gapEmit(7L, Iterator.empty, s3).toList
    assert(out3 == List(GapOut(7L, 0L, 30 * H * 1000L, 30 * 3600L)),
      s"expected exactly the true 0→30h gap; got $out3")
    // the sealed anchor must PERSIST: it is the lag() cursor
    assert(!s3.isRemoved && s3.get.hasSealed && s3.get.sealedUs == 50 * H * 1000L
      && s3.get.buf.isEmpty, s"anchor must survive full sealing; state ${s3.get}")

    // batch 4: the user RETURNS at t=200h after a long quiet period —
    // lag semantics pair it with the 50h anchor (a 150h gap). The
    // pre-fix eviction dropped the anchor on the batch-3 timeout and
    // silently lost exactly this gap.
    val s4 = mkState(Some(s3.get), wmMs = 150 * H, timedOut = true)
    val out4 = Streaming.gapEmit(7L, Iterator(ev(9, 200)), s4).toList
    assert(out4.isEmpty, "200h is not sealed yet")
    val s5 = mkState(Some(s4.get), wmMs = 300 * H, timedOut = true)
    val out5 = Streaming.gapEmit(7L, Iterator.empty, s5).toList
    assert(out5 == List(GapOut(7L, 50 * H * 1000L, 200 * H * 1000L, 150 * 3600L)),
      s"returning-user gap must emit against the persisted anchor; got $out5")
  }

  test("gapEmit: single-batch delivery still matches lag semantics") {
    val s1 = mkState(None, wmMs = 0L, timedOut = false)
    assert(Streaming.gapEmit(7L, Iterator(ev(1, 0), ev(2, 30), ev(3, 50), ev(4, 100)), s1)
      .toList.isEmpty)
    val s2 = mkState(Some(s1.get), wmMs = 500 * H, timedOut = true)
    val out = Streaming.gapEmit(7L, Iterator.empty, s2).toList
    assert(out == List(
      GapOut(7L, 0L, 30 * H * 1000L, 30 * 3600L),
      GapOut(7L, 50 * H * 1000L, 100 * H * 1000L, 50 * 3600L)), s"got $out")
    assert(!s2.isRemoved && s2.get.sealedUs == 100 * H * 1000L,
      "anchor persists after full sealing")
  }

  test("gapEmitTtl: sealed anchors evict after the TTL (opt-in approximate lag)") {
    val ttlUs = 100L * H * 1000L // 100 h of event-time silence
    val emit = Streaming.gapEmitTtl(ttlUs) _
    // seal events 0h and 30h: the 0→30h gap emits, anchor parks at 30h
    val s1 = mkState(None, wmMs = 0L, timedOut = false)
    assert(emit(7L, Iterator(ev(1, 0), ev(2, 30)), s1).toList.isEmpty)
    val s2 = mkState(Some(s1.get), wmMs = 60 * H, timedOut = true)
    val out2 = emit(7L, Iterator.empty, s2).toList
    assert(out2 == List(GapOut(7L, 0L, 30 * H * 1000L, 30 * 3600L)), s"got $out2")
    // within the TTL the anchor persists and parks on its EXPIRY, not
    // the far-future quiet target
    assert(!s2.isRemoved && s2.get.sealedUs == 30 * H * 1000L)
    assert(s2.getTimeoutTimestampMs.get <= (30 + 100) * H + 1000L,
      s"TTL anchor must park on its expiry; parked at ${s2.getTimeoutTimestampMs}")
    // past the TTL (watermark 30h + 100h + ε), the fired timeout EVICTS
    val s3 = mkState(Some(s2.get), wmMs = 131 * H, timedOut = true)
    assert(emit(7L, Iterator.empty, s3).toList.isEmpty)
    assert(s3.isRemoved, "TTL-expired sealed anchor must evict")
    // the accepted approximation: the user returning at 200h starts a
    // FRESH anchor — no 30→200h pair (exact gapEmit would emit it)
    val s4 = mkState(None, wmMs = 150 * H, timedOut = false)
    assert(emit(7L, Iterator(ev(9, 200)), s4).toList.isEmpty)
    val s5 = mkState(Some(s4.get), wmMs = 300 * H, timedOut = true)
    assert(emit(7L, Iterator.empty, s5).toList.isEmpty,
      "a fresh anchor has no predecessor — the documented TTL trade")
    assert(!s5.isRemoved && s5.get.sealedUs == 200 * H * 1000L)
  }
}
