package org.apache.spark.graftmetrics

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query task-metric capture — the engine analog of the reference's
  * per-kernel SyclProfiler START/STOP windows (reference
  * `src/helper.h:124-196`): where the reference samples kernel time /
  * memory between marks, Spark's execution already accumulates exact
  * task metrics, so the profiler reduces to summing them between
  * reset() and snapshot().
  *
  * Lives under `org.apache.spark` because the deterministic flush —
  * `LiveListenerBus.waitUntilEmpty`, needed so a snapshot sees every
  * event of the just-finished query — is `private[spark]`.
  */
final class StageMetricsListener extends SparkListener {
  private val shuffleWriteBytes = new LongAdder
  private val shuffleWriteRecords = new LongAdder
  private val shuffleReadBytes = new LongAdder
  private val inputRecords = new LongAdder
  private val spillBytes = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleWriteRecords.add(m.shuffleWriteMetrics.recordsWritten)
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      inputRecords.add(m.inputMetrics.recordsRead)
      spillBytes.add(m.diskBytesSpilled + m.memoryBytesSpilled)
    }
  }

  def reset(sc: SparkContext): Unit = {
    flush(sc)
    Seq(shuffleWriteBytes, shuffleWriteRecords, shuffleReadBytes, inputRecords, spillBytes)
      .foreach(_.reset())
  }

  /** Flush pending listener events, then read the accumulated sums. */
  def snapshot(sc: SparkContext): Seq[(String, Long)] = {
    flush(sc)
    Seq(
      "shuffle_write_bytes" -> shuffleWriteBytes.sum(),
      "shuffle_records" -> shuffleWriteRecords.sum(),
      "shuffle_read_bytes" -> shuffleReadBytes.sum(),
      "input_records" -> inputRecords.sum(),
      "spill_bytes" -> spillBytes.sum())
  }

  private def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
