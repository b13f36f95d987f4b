package graft.engine

import java.io.PrintStream
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Live progress rendering for `--show progress` — the reference's
  * show_messages UI thread (collect.py:165-172): a transient view of the
  * latest message per source repainted on a 1-second poll, with the final
  * messages replayed once, in full, when the run ends.
  *
  * The repaint uses ANSI cursor-up; on a non-ANSI sink only the final
  * replay is printed (`live = false`).
  */
final class ConsoleProgressRenderer(
    out: PrintStream = System.err,
    live: Boolean = true,
    pollMillis: Long = 1000L) extends ProgressListener with AutoCloseable {

  // latest message per source/task, insertion-ordered for stable rendering
  private val state = new ConcurrentHashMap[String, String]()
  private val order = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val ended = new AtomicBoolean(false)
  @volatile private var painted = 0

  private val ticker = new Thread(() => {
    while (!ended.get()) {
      if (live) repaint()
      try Thread.sleep(pollMillis) catch { case _: InterruptedException => }
    }
  }, "graft-progress-render")
  ticker.setDaemon(true)
  ticker.start()

  private def put(key: String, message: String): Unit = {
    if (state.putIfAbsent(key, message) == null) order.add(key)
    else state.put(key, message)
  }

  def progress(source: String, message: String): Unit = put(source, message)

  override def progressDone(task: String, current: Int, total: Int): Unit =
    put(task, s"$current/$total")

  private def lines: Seq[String] =
    order.asScala.toSeq.map(k => s"$k: ${state.get(k)}")

  private def repaint(): Unit = synchronized {
    if (ended.get()) return // close() already replayed; don't print again
    val ls = lines
    if (painted > 0) out.print(s"\u001b[${painted}F\u001b[J") // up N + clear
    ls.foreach(out.println)
    painted = ls.size
  }

  /** End the live view and replay the final messages (reference
    * collect.py:170-172 `rendered_messages` replay).
    */
  def close(): Unit = {
    if (ended.compareAndSet(false, true)) {
      ticker.interrupt()
      // replay inside the same lock repaint uses, so an in-flight ticker
      // repaint can never interleave with — or duplicate — the final output
      synchronized {
        if (live && painted > 0) out.print(s"\u001b[${painted}F\u001b[J")
        painted = 0
        lines.foreach(out.println)
      }
    }
  }
}
