package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two properties that make content-defined chunking the right
  * sub-document dedup primitive (previously asserted only in a comment):
  *
  *  1. POSITION INVARIANCE — a paragraph chunks identically wherever it
  *     appears, because boundaries read only the adjacent token bigram.
  *     Only the paragraph's first and last chunk can be contaminated by
  *     surrounding text (no boundary is guaranteed at the junctions).
  *  2. EDIT LOCALITY — a single-token edit touches only the bigrams at the
  *     edit position, so it can re-draw at most the two boundaries beside
  *     it: the chunks away from the edit are untouched.
  *
  * Fixed-size windows have neither property (an insertion shifts every
  * later window), which is exactly why q_dedup_chunks uses CDC.
  */
class CdcChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val rnd = new scala.util.Random(41)
  private def tok(): String = s"w${rnd.nextInt(500)}"
  private def para(n: Int): Seq[String] = Seq.fill(n)(tok())

  /** Chunk-hash lists per doc, in chunk order, via the real operator. */
  private def chunksOf(texts: Seq[String]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Dedup.cdcChunks(df)
      .orderBy("doc_id", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  private def multisetDiff(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val counts = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    b.foreach(h => counts(h) += 1)
    a.filter { h => if (counts(h) > 0) { counts(h) -= 1; false } else true }
  }

  test("a shared paragraph chunks identically wherever it appears") {
    val p = para(240)
    val docs = Seq(
      p.mkString(" "),                                         // standalone
      (para(90) ++ p ++ para(110)).mkString(" "),              // embedded A
      (para(150) ++ p ++ para(60)).mkString(" "),              // embedded B
      (p ++ para(200)).mkString(" "),                          // at the start
      (para(200) ++ p).mkString(" "))                          // at the end
    val ch = chunksOf(docs)
    val standalone = ch(0L)
    assert(standalone.size >= 5, s"paragraph too short to test (${standalone.size} chunks)")
    // interior chunks: everything but the first and last, which may merge
    // with surrounding text at the junctions
    val interior = standalone.drop(1).dropRight(1)
    (1L to 4L).foreach { d =>
      val missing = multisetDiff(interior, ch(d))
      assert(missing.isEmpty,
        s"doc $d lost ${missing.size}/${interior.size} interior chunks of the shared paragraph")
    }
  }

  test("chunking is invariant under document concatenation order (junctions aside)") {
    val p1 = para(200)
    val p2 = para(200)
    val ch = chunksOf(Seq(
      p1.mkString(" "), p2.mkString(" "),
      (p1 ++ p2).mkString(" "), (p2 ++ p1).mkString(" ")))
    val interior1 = ch(0L).drop(1).dropRight(1)
    val interior2 = ch(1L).drop(1).dropRight(1)
    Seq(2L, 3L).foreach { d =>
      assert(multisetDiff(interior1, ch(d)).isEmpty, s"doc $d lost interior chunks of p1")
      assert(multisetDiff(interior2, ch(d)).isEmpty, s"doc $d lost interior chunks of p2")
    }
    // the two arrangements differ only at the junction/ends: at most 2
    // chunks per boundary region on each side
    val fwd = ch(2L); val rev = ch(3L)
    assert(fwd.size == rev.size || math.abs(fwd.size - rev.size) <= 2)
    assert(multisetDiff(fwd, rev).size <= 4 && multisetDiff(rev, fwd).size <= 4,
      "concatenation order changed chunks away from the junction")
  }

  test("a single-token edit changes at most the chunks beside the edit") {
    val base = para(400)
    val edits = (0 until 40).map(_ => rnd.nextInt(base.size))
    val docs = base.mkString(" ") +: edits.map { pos =>
      base.updated(pos, "EDITED").mkString(" ")
    }
    val ch = chunksOf(docs)
    val orig = ch(0L)
    var within2 = 0
    edits.indices.foreach { i =>
      val edited = ch((i + 1).toLong)
      val removed = multisetDiff(orig, edited)
      val added = multisetDiff(edited, orig)
      // hard bound: the edit touches 2 bigrams -> at most 2 re-drawn
      // boundaries -> the affected region spans at most 3 old / 3 new
      // chunks (both-boundaries-merge worst case)
      assert(removed.size <= 3 && added.size <= 3,
        s"edit $i at ${edits(i)}: ${removed.size} removed / ${added.size} added chunks")
      assert(math.abs(orig.size - edited.size) <= 2,
        s"edit $i changed the chunk count by ${math.abs(orig.size - edited.size)}")
      if (removed.size <= 2 && added.size <= 2) within2 += 1
    }
    // the typical case (no boundary re-drawn, or one) is <= 2 chunks; the
    // 3-chunk merge needs two boundary coincidences and must stay rare
    assert(within2 >= (edits.size * 0.8).toInt,
      s"only $within2/${edits.size} edits stayed within 2 chunks")
  }
}
