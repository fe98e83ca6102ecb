package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task-metric snapshot (deltas via [[TaskSnap.minus]]).
  * `runMs` is executor task-thread wall (includes IO/scheduler wait —
  * inflatable by writeback and contention); `cpuNs` is the CPU the
  * tasks actually consumed — the contamination-proof statistic: a
  * foreign process stealing cores stretches wall but cannot add to
  * OUR tasks' cpu time, so probe runs of the same plan over the same
  * data must agree on it. */
final case class TaskSnap(runMs: Long, cpuNs: Long, input: Long,
                          shuffleRead: Long, shuffleWrite: Long,
                          gcMs: Long = 0L, spill: Long = 0L) {
  def minus(o: TaskSnap): TaskSnap = TaskSnap(runMs - o.runMs,
    cpuNs - o.cpuNs, input - o.input, shuffleRead - o.shuffleRead,
    shuffleWrite - o.shuffleWrite, gcMs - o.gcMs, spill - o.spill)
  def cpuSec: Double = cpuNs / 1e9
  def taskSec: Double = runMs / 1e3
  /** GC wall inside task windows (jvmGCTime — part of runMs, NOT of
    * cpuNs: stop-the-world pauses park the task thread). */
  def gcSec: Double = gcMs / 1e3
}

/** Per-task metric tally on the listener bus — the shared measurement
  * instrument of the scale probe and the bench's per-stage
  * attribution (VERDICT r10 #3: stage numbers from task metrics, not
  * wall clocks a loaded machine can stretch). Two read paths:
  *
  *  - cumulative [[snap]] deltas, for code that brackets a sequential
  *    region (the curation stage probe, the scale probe's per-query
  *    bytes);
  *  - [[window]] aggregation over per-task finish timestamps, for
  *    regions whose boundaries are only known from an external log
  *    (the sales pipeline writes stage start/end instants; tasks are
  *    attributed to the enclosing stage window — both clocks are this
  *    JVM's currentTimeMillis).
  *
  * Events arrive async off the task path; [[quiesce]] waits (bounded)
  * for the stream to drain before a snapshot is read. */
final class TaskTally extends SparkListener {
  private val tasks =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, TaskSnap)]
  private val events = new AtomicLong
  private val runMs = new AtomicLong
  private val cpuNs = new AtomicLong
  private val input = new AtomicLong
  private val shuffleRead = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val gcMs = new AtomicLong
  private val spill = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    events.incrementAndGet()
    val m = t.taskMetrics
    if (m != null) {
      val s = TaskSnap(m.executorRunTime, m.executorCpuTime,
        m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten, m.jvmGCTime,
        m.memoryBytesSpilled + m.diskBytesSpilled)
      tasks.add((if (t.taskInfo != null) t.taskInfo.finishTime else 0L, s))
      runMs.addAndGet(s.runMs); cpuNs.addAndGet(s.cpuNs)
      input.addAndGet(s.input); shuffleRead.addAndGet(s.shuffleRead)
      shuffleWrite.addAndGet(s.shuffleWrite)
      gcMs.addAndGet(s.gcMs); spill.addAndGet(s.spill)
      ()
    }
  }

  def snap(): TaskSnap = TaskSnap(runMs.get, cpuNs.get, input.get,
    shuffleRead.get, shuffleWrite.get, gcMs.get, spill.get)

  /** Sum of tasks whose finish timestamp lies in [w0, w1] (epoch ms,
    * inclusive — stage windows are sequential and disjoint). */
  def window(w0: Long, w1: Long): TaskSnap = {
    var r = 0L; var c = 0L; var i = 0L; var sr = 0L; var sw = 0L
    var g = 0L; var sp = 0L
    tasks.forEach { case (ft, s) =>
      if (ft >= w0 && ft <= w1) {
        r += s.runMs; c += s.cpuNs; i += s.input
        sr += s.shuffleRead; sw += s.shuffleWrite
        g += s.gcMs; sp += s.spill
      }
    }
    TaskSnap(r, c, i, sr, sw, g, sp)
  }

  /** Wait (bounded) until no new task-end events for two polls. */
  def quiesce(pollMs: Long = 150L): Unit = {
    var last = -1L
    var stable = 0
    val deadline = System.nanoTime() + 5_000_000_000L
    while (stable < 2 && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      val e = events.get()
      if (e == last) stable += 1 else { stable = 0; last = e }
    }
  }
}
