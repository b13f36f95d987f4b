package graft

import graft.ext.SubstringDedup
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the span algebra under random inputs: the
  * example-based SubstringDedupSpec pins specific fixtures; these pin the
  * INVARIANTS — trim conserves exactly the non-span characters in order,
  * and a full self-dedup pass is idempotent.
  */
class SpanPropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"

  /** Random disjoint, non-adjacent, sorted spans inside [1, len]. */
  private def randomSpans(len: Int, rnd: scala.util.Random): List[(Long, Long)] = {
    val pts = List.fill(2 * rnd.nextInt(5))(1 + rnd.nextInt(len)).distinct.sorted
    pts.grouped(2).collect { case List(a, b) if b > a => (a.toLong, b.toLong) }
      .foldLeft(List.empty[(Long, Long)]) { // enforce a gap between spans
        case (acc, (a, b)) if acc.isEmpty || a > acc.head._2 + 1 => (a, b) :: acc
        case (acc, _)                                            => acc
      }.reverse
  }

  test("trimSpans conserves exactly the outside-span characters, in order (30 random cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    for (_ <- 1 to 30) {
      val len = 20 + rnd.nextInt(100)
      val spans = randomSpans(len, rnd)
      val text = Seq.fill(len)(alphabet(rnd.nextInt(36))).mkString
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val spanDf = spans.map { case (a, b) => (1L, a, b) }
        .toDF("doc_id", "span_start", "span_end")
      val out = SubstringDedup.trimSpans(docs, spanDf).collect()(0).getString(1)
      val expected = text.zipWithIndex.collect {
        case (c, i) if !spans.exists { case (a, b) => i + 1 >= a && i + 1 <= b } => c
      }.mkString
      assert(out === expected, s"len=$len spans=$spans")
    }
  }

  test("selfDedupCut is idempotent: a second pass changes nothing") {
    import spark.implicits._
    val rnd = new scala.util.Random(4099)
    def noise(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(36))).mkString
    val shared = noise(50)
    val docs = Seq(
      (0L, noise(20) + shared + noise(15)),
      (1L, shared + noise(30)),
      (2L, noise(40) + shared),
      (3L, noise(80))
    ).toDF("doc_id", "text")
    val once = SubstringDedup.selfDedupCut(docs, k = 16)
      .withColumnRenamed("text_clean", "text")
    val twice = SubstringDedup.selfDedupCut(once, k = 16)
    val a = once.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }
}
