package graft.engine

import java.io.PrintStream
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Live progress rendering for `--show progress` — the reference's
  * show_messages UI thread (collect.py:165-172): a TRANSIENT live view
  * repainted on a 1-second poll, with the final messages replayed once, in
  * plain form, when the run ends (`rendered_messages()` replay,
  * collect.py:170-172).
  *
  * The live view is a rich-style table — one row per source/task with its
  * elapsed time, latest message, and a progress bar for completion ticks —
  * mirroring the reference's `Live(CollectInfo.render())` layout. The
  * repaint uses ANSI cursor-up; on a non-ANSI sink only the final replay
  * is printed (`live = false`), and the replay keeps the stable
  * `key: message` shape scripts can parse.
  */
final class ConsoleProgressRenderer(
    out: PrintStream = System.err,
    live: Boolean = true,
    pollMillis: Long = 1000L) extends ProgressListener with AutoCloseable {

  private final case class Entry(
      message: String,
      startedNanos: Long,
      done: Option[(Int, Int)])

  // latest entry per source/task, insertion-ordered for stable rendering
  private val state = new ConcurrentHashMap[String, Entry]()
  private val order = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val ended = new AtomicBoolean(false)
  @volatile private var painted = 0

  private val ticker = new Thread(() => {
    while (!ended.get()) {
      repaint()
      try Thread.sleep(pollMillis) catch { case _: InterruptedException => }
    }
  }, "graft-progress-render")
  ticker.setDaemon(true)
  // non-live renderers never repaint — don't spin a 1 Hz no-op wakeup
  // thread for their whole lifetime (close() interrupts unconditionally;
  // interrupting a never-started thread is a harmless flag set)
  if (live) ticker.start()

  private def put(key: String, message: String, done: Option[(Int, Int)]): Unit = {
    // one PHYSICAL line per entry: painted counts entries, and the ANSI
    // cursor-up repaint math breaks if a message smuggles line breaks in
    // (Spark exception messages routinely embed plans) — stale lines
    // would then accumulate on every tick. Same hazard for LENGTH: a row
    // wider than the terminal WRAPS onto several physical lines the
    // cursor-up-N math undercounts, so cap to the terminal width
    // ($COLUMNS when exported, else a conservative 80) minus the table
    // prefix the renderer adds.
    val width = sys.env.get("COLUMNS").flatMap(_.toIntOption).getOrElse(80)
    val maxMsg = math.max(20, width - 30)
    val flat0 = message.replaceAll("[\r\n]+", " ¶ ")
    val flat = if (flat0.length <= maxMsg) flat0 else flat0.take(maxMsg - 1) + "…"
    val fresh = Entry(flat, System.nanoTime(), done)
    val prev = state.putIfAbsent(key, fresh)
    if (prev == null) order.add(key)
    else state.put(key, fresh.copy(startedNanos = prev.startedNanos))
  }

  def progress(source: String, message: String): Unit = put(source, message, None)

  override def progressDone(task: String, current: Int, total: Int): Unit =
    put(task, s"$current/$total", Some((current, total)))

  /** Plain replay lines — the reference's rendered_messages() shape. */
  private def lines: Seq[String] =
    order.asScala.toSeq.map(k => s"$k: ${state.get(k).message}")

  private def bar(current: Int, total: Int, width: Int = 10): String = {
    // clamp: progressDone(t, 3, 2) must not overflow the column. An empty
    // work set (0/0) renders EMPTY, not full — a full bar would claim
    // completion of work that never ran; nonzero progress against an
    // unknown total renders full (all reported work done).
    val filled = (if (total <= 0) { if (current > 0) width else 0 }
                  else (width * current.toLong / total).toInt)
      .max(0).min(width)
    // ASCII bar: immune to non-UTF-8 console charsets
    "[" + "#" * filled + "-" * (width - filled) + "]"
  }

  private def elapsed(e: Entry): String = {
    val s = (System.nanoTime() - e.startedNanos) / 1e9
    if (s < 60) f"$s%5.1fs" else f"${(s / 60).toInt}%2dm${(s % 60).toInt}%02ds"
  }

  /** The live table: name | elapsed | bar-or-message, width-aligned. */
  private def tableLines: Seq[String] = {
    val keys = order.asScala.toSeq
    if (keys.isEmpty) return Nil
    val w = keys.map(_.length).max
    keys.map { k =>
      val e = state.get(k)
      val status = e.done match {
        case Some((c, t)) => s"${bar(c, t)} $c/$t"
        case None         => e.message
      }
      s"  ${k.padTo(w, ' ')}  ${elapsed(e)}  $status"
    }
  }

  private def repaint(): Unit = synchronized {
    if (ended.get()) return // close() already replayed; don't print again
    val ls = tableLines
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
