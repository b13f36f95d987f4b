package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-training semantics on planted corpora: greedy left-to-right
  * merging, boundary non-consumption, frequency weighting, tie-breaks, and
  * the training ≡ serving consistency of the word-table artifact.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import Bpe.Sep

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("first merge is the highest-frequency adjacent pair, weighted by word freq") {
    // "ab" appears in 3 tokens x high freq; planted so (a,b) wins round 1
    val d = docs("abc abc abc abd", "abe xy")
    val (merges, _) = Bpe.train(d, rounds = 1)
    val m = merges.collect().head
    assert((m.getAs[String]("left_sym"), m.getAs[String]("right_sym")) == ("a", "b"))
    // count: abc x3 + abd x1 + abe x1 = 5 occurrences of adjacent (a,b)
    assert(m.getAs[Long]("pair_count") == 5L)
  }

  test("greedy left-to-right: 'aaa' merges to [aa, a], never [a, aa] or [aa, aa]") {
    val d = docs("aaa aaa aa")
    val (_, words) = Bpe.train(d, rounds = 1) // merge must be (a,a)
    val enc = words.filter(col("w") === "aaa").select("enc").collect().head.getString(0)
    assert(enc == s"${Sep}aa${Sep}${Sep}a${Sep}", s"got ${enc.replace(Sep, "|")}")
  }

  test("merge does not consume the next occurrence's boundary: 'abab' -> [ab, ab]") {
    val d = docs("abab abab ab")
    val (merges, words) = Bpe.train(d, rounds = 1)
    val m = merges.collect().head
    assert((m.getAs[String]("left_sym"), m.getAs[String]("right_sym")) == ("a", "b"))
    val enc = words.filter(col("w") === "abab").select("enc").collect().head.getString(0)
    assert(enc == s"${Sep}ab${Sep}${Sep}ab${Sep}", s"got ${enc.replace(Sep, "|")}")
  }

  test("adjacent occurrences all merge in one pass: 'aaaa' -> [aa, aa]") {
    // the double-separator encoding must not let a match consume the next
    // occurrence's boundary — real BPE merges all non-overlapping pairs
    // left-to-right in a single pass
    val d = docs("aaaa aaaa aa")
    val (_, words) = Bpe.train(d, rounds = 1) // merge is (a,a)
    val enc = words.filter(col("w") === "aaaa").select("enc").collect().head.getString(0)
    assert(enc == s"${Sep}aa${Sep}${Sep}aa${Sep}", s"got ${enc.replace(Sep, "|")}")
  }

  test("merge pattern anchors BOTH symbol ends: (x,a) never fires inside [x, ab]") {
    // round 1 learns (a,b) (count 4: ab x3 + xab); round 2 learns (x,a)
    // (count 2, from xa) — applying it to "xab", now encoded [x, ab], must
    // NOT match: the 'a' there is the PREFIX of symbol "ab", not a full
    // symbol. The leading-separator-only encoding corrupted this word to
    // one bogus symbol "xab"; the double-separator pattern is r-end-anchored.
    val d = docs("ab ab ab xa xa xab")
    val (merges, words) = Bpe.train(d, rounds = 2)
    val ms = mergeRows(merges)
    assert(ms.map { case (_, l, r, _) => (l, r) } == Seq(("a", "b"), ("x", "a")), s"got $ms")
    val enc = encOf(words)
    assert(enc("xab") == s"${Sep}x${Sep}${Sep}ab${Sep}",
      s"got ${enc("xab").replace(Sep, "|")} — (x,a) merged into a multi-char symbol's prefix")
    assert(enc("xa") == s"${Sep}xa${Sep}", s"got ${enc("xa").replace(Sep, "|")}")
  }

  test("later rounds operate on merged symbols (can learn multi-char merges)") {
    // round 1 learns (a,b); round 2 must see symbol "ab" and learn (ab,c)
    val d = docs("abc abc abc abc ab")
    val (merges, words) = Bpe.train(d, rounds = 2)
    val ms = merges.orderBy("round").collect()
    assert((ms(0).getAs[String]("left_sym"), ms(0).getAs[String]("right_sym")) == ("a", "b"))
    assert((ms(1).getAs[String]("left_sym"), ms(1).getAs[String]("right_sym")) == ("ab", "c"))
    val enc = words.filter(col("w") === "abc").select("enc").collect().head.getString(0)
    assert(enc == s"${Sep}abc${Sep}", s"got ${enc.replace(Sep, "|")}")
  }

  test("tie on count breaks lexicographically") {
    // (x,y) and (a,b) both appear exactly twice; (a,b) must win
    val d = docs("xy xy ab ab")
    val (merges, _) = Bpe.train(d, rounds = 1)
    val m = merges.collect().head
    assert((m.getAs[String]("left_sym"), m.getAs[String]("right_sym")) == ("a", "b"))
  }

  test("merge algebra equals a reference greedy fold on random words (property)") {
    // the separator-encoded replace() IS the greedy left-to-right BPE merge
    // — pinned against a direct recursive reference over every pair of a
    // 2-letter alphabet, where overlap and boundary cases are densest
    import spark.implicits._
    import org.apache.spark.sql.functions.{replace => sqlReplace}
    val rnd = new scala.util.Random(71)
    val words = (0 until 300).map(_ =>
      (0 until (1 + rnd.nextInt(10))).map(_ => "ab" (rnd.nextInt(2))).mkString)
      .distinct
    def refMerge(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest => x :: refMerge(rest, a, b)
      case Nil => Nil
    }
    for (a <- Seq("a", "b"); b <- Seq("a", "b")) {
      val got = words.toDF("w")
        .withColumn("enc", Bpe.charEncode(col("w")))
        .withColumn("enc", sqlReplace(col("enc"),
          lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep)))
        .select(col("w"), Bpe.symsOf(col("enc")).as("syms"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      words.foreach { w =>
        val expect = refMerge(w.toList.map(_.toString), a, b)
        assert(got(w) == expect,
          s"word '$w' pair ($a,$b): engine ${got(w)} vs reference $expect")
      }
    }
  }

  test("merge algebra with MULTI-CHAR symbols equals the reference fold (property)") {
    // the r-end false-positive only manifests once symbols are multi-char:
    // after merging (a,b), a second merge with l or r = "ab" must match
    // only FULL "ab" symbols. Random words over {a,b}, every second merge
    // from {(ab,a),(a,ab),(ab,ab),(ab,b)} — engine replace-chain vs a
    // direct recursive fold on symbol lists.
    import spark.implicits._
    import org.apache.spark.sql.functions.{replace => sqlReplace}
    val rnd = new scala.util.Random(72)
    val words = (0 until 300).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => "ab" (rnd.nextInt(2))).mkString)
      .distinct
    def refMerge(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest => x :: refMerge(rest, a, b)
      case Nil => Nil
    }
    for ((l2, r2) <- Seq(("ab", "a"), ("a", "ab"), ("ab", "ab"), ("ab", "b"))) {
      val got = words.toDF("w")
        .withColumn("enc", Bpe.charEncode(col("w")))
        .withColumn("enc", sqlReplace(col("enc"),
          lit(Sep + "a" + Sep + Sep + "b" + Sep), lit(Sep + "ab" + Sep)))
        .withColumn("enc", sqlReplace(col("enc"),
          lit(Sep + l2 + Sep + Sep + r2 + Sep), lit(Sep + l2 + r2 + Sep)))
        .select(col("w"), Bpe.symsOf(col("enc")).as("syms"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      words.foreach { w =>
        val expect = refMerge(refMerge(w.toList.map(_.toString), "a", "b"), l2, r2)
        assert(got(w) == expect,
          s"word '$w' merge2 ($l2,$r2): engine ${got(w)} vs reference $expect")
      }
    }
  }

  test("vocab at rest: stored parquet apply equals the in-memory apply") {
    val d = docs("abc abc abc abab ab", "aaa xy xy zq abc")
    val (_, words) = Bpe.train(d, rounds = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-vocab").toString
    Bpe.writeVocab(words, dir)
    def counts(vocab: org.apache.spark.sql.DataFrame) =
      Bpe.applyVocab(d, vocab).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stored = counts(Bpe.loadVocab(spark, dir))
    assert(stored.nonEmpty && stored == counts(Bpe.vocabOf(words)),
      "stored-vocab apply diverges from in-memory apply")
  }

  test("OOV serving fallback: unseen words count char-level symbols, never vanish") {
    // vocab trained on a closed corpus ("abc" -> 1 symbol, "ab" -> 1 after
    // two rounds); serving documents carry novel words, which a real BPE
    // tokenizer byte-falls-back on — applyVocab must count them at
    // character level (length(w)), not drop them from either aggregate
    val (_, words) = Bpe.train(docs("abc abc abc abc ab"), rounds = 2)
    val vocab = Bpe.vocabOf(words)
    val serve = docs("abc zqzq", "ab unseen abc")
    val got = Bpe.applyVocab(serve, vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((2L, 5L)), s"doc 0: $got") // abc(1) + zqzq OOV(4 chars)
    assert(got(1L) == ((3L, 8L)), s"doc 1: $got") // ab(1) + unseen OOV(6) + abc(1)
    // the at-rest artifact serves identically
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-oov").toString
    Bpe.writeVocab(words, dir)
    val stored = Bpe.applyVocab(serve, Bpe.loadVocab(spark, dir)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stored == got, "at-rest vocab diverges on OOV serving")
  }

  private def mergeRows(m: org.apache.spark.sql.DataFrame) =
    m.orderBy("round").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def encOf(words: org.apache.spark.sql.DataFrame) =
    words.select("w", "enc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("encode materializes frequency-ranked token ids in text order") {
    // one round learns (a,b): abc -> [ab, c], ab -> [ab], xy -> [x, y].
    // Symbol corpus freqs: ab=4, c=3, x=1, y=1 -> ids ab=1, c=2, x=3, y=4
    // (freq DESC, symbol ASC). The document's id sequence must follow
    // text order across BOTH token position and symbol position.
    val d = docs("abc abc abc ab xy")
    val (_, words) = Bpe.train(d, rounds = 1)
    val out = Bpe.encode(d, words).collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Int](1) == Seq(1, 2, 1, 2, 1, 2, 1, 3, 4),
      s"got ${out.head.getSeq[Int](1)}")
    spark.catalog.clearCache()
  }

  test("decode inverts encode: symbol stream round-trips losslessly") {
    // decode(encode(docs)) must equal each document's token stream with
    // inter-token spaces dropped — BPE merges never cross token
    // boundaries, so the concatenated symbols ARE the concatenated tokens
    val d = docs("abc abc abc ab xy", "aaa abab abc", "zq zq ab")
    val (_, words) = Bpe.train(d, rounds = 2)
    val ids = Bpe.symbolIds(words)
    val decoded = Bpe.decode(Bpe.encodeWith(d, words, ids), ids).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()
    val expected = d.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").mkString("")).toMap
    assert(decoded == expected, s"round-trip diverged: $decoded vs $expected")
  }

  test("tokenizer at rest: stored encode equals in-memory encode, ids frozen") {
    val d = docs("abc abc abc ab xy", "ab ab cd cd")
    val (_, words) = Bpe.train(d, rounds = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-tok").toString
    Bpe.writeTokenizer(words, dir)
    val (wStored, idsStored) = Bpe.loadTokenizer(spark, dir)
    def seqs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val inMem = seqs(Bpe.encode(d, words))
    spark.catalog.clearCache()
    val stored = seqs(Bpe.encodeWith(d, wStored, idsStored))
    assert(stored.nonEmpty && stored == inMem,
      "stored tokenizer diverges from in-memory encode")
    // the persisted id table equals a fresh ranking of the stored words
    // (main symbol page + char-fallback page)
    val fresh = Bpe.fullSymbolIds(wStored).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    spark.catalog.clearCache()
    val persisted = idsStored.collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(persisted == fresh)
  }

  test("OOV encode: novel words char-fall-back to ids, unknown chars to UnkId — full length always") {
    // train until "ab" and "cd" fully merge: the post-merge symbol table
    // is {ab, cd} and the bare chars a,b,c,d survive only on the
    // char-fallback page of the at-rest id table
    val d = docs("ab ab ab cd cd")
    val (_, words) = Bpe.train(d, rounds = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-oovid").toString
    Bpe.writeTokenizer(words, dir)
    val (wStored, idsStored) = Bpe.loadTokenizer(spark, dir)
    val idOf = idsStored.collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    // main page: ab (freq 3) -> 1, cd (freq 2) -> 2; char page: a,b (freq 3)
    // then c,d (freq 2), char ASC within ties -> a=3, b=4, c=5, d=6
    assert(idOf == Map("ab" -> 1, "cd" -> 2, "a" -> 3, "b" -> 4, "c" -> 5, "d" -> 6), s"got $idOf")
    // serving doc: "ba" (novel word, known chars), "qq" (unknown char),
    // "ab" (in vocab) — sequence must keep FULL length: 2 + 2 + 1 = 5 ids
    val serve = docs("ba qq ab")
    val got = Bpe.encodeWith(serve, wStored, idsStored).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    spark.catalog.clearCache()
    assert(got(0L) == List(4, 3, Bpe.UnkId, Bpe.UnkId, 1), s"got $got")
    // decode stays total: unknown ids render as the replacement char
    val decoded = Bpe.decode(Bpe.encodeWith(serve, wStored, idsStored), idsStored)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()
    assert(decoded(0L) == "ba\uFFFD\uFFFDab", s"got $decoded")
    // and the in-memory path (symbolIds only, no char page) still keeps
    // full length — chars off the table resolve to UnkId
    val inMem = Bpe.encode(serve, words).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    spark.catalog.clearCache()
    assert(inMem(0L).length == 5 && inMem(0L).last == 1, s"got $inMem")
    assert(inMem(0L).take(4).forall(_ == Bpe.UnkId), s"got $inMem")
  }

  test("trainBatched(batchK=1) is bit-identical to sequential train") {
    val d = docs("abc abc abc abab ab", "aaa xy xy zq abc")
    val (seqM, seqW) = Bpe.train(d, rounds = 4)
    val (batM, batW) = Bpe.trainBatched(d, totalMerges = 4, batchK = 1)
    assert(mergeRows(batM) == mergeRows(seqM))
    assert(encOf(batW) == encOf(seqW))
  }

  test("trainBatched selects symbol-disjoint merges; planted corpus matches sequential") {
    // counts (a,b)=3 > (c,d)=2 > (x,y)=1, all symbol-disjoint and each
    // pair fully merges its word — one batched round of 3 must equal
    // three sequential rounds exactly
    val d = docs("ab ab ab cd cd xy")
    val (seqM, seqW) = Bpe.train(d, rounds = 3)
    val (batM, batW) = Bpe.trainBatched(d, totalMerges = 3, batchK = 3)
    assert(mergeRows(batM) == mergeRows(seqM))
    assert(encOf(batW) == encOf(seqW))
    // and the disjointness invariant holds on the recorded merges
    val syms = mergeRows(batM).flatMap { case (_, l, r, _) => Seq(l, r) }
    assert(syms.distinct.size == syms.size)
  }

  test("trainBatched defers conflicting pairs to the next round's recount") {
    // (a,b)=3 and (b,c)=2 share symbol b: round 1 may only take (a,b);
    // (b,c) must merge from round 2's recount — identical to sequential
    val d = docs("ab ab ab bc bc")
    val (seqM, _) = Bpe.train(d, rounds = 2)
    val (batM, _) = Bpe.trainBatched(d, totalMerges = 2, batchK = 2)
    assert(mergeRows(batM) == mergeRows(seqM))
    assert(mergeRows(batM).map { case (_, l, r, _) => (l, r) } ==
      Seq(("a", "b"), ("b", "c")))
  }

  test("trainBatched stops at vocabulary exhaustion like train") {
    val d = docs("ab ab ab")
    val (m, w) = Bpe.trainBatched(d, totalMerges = 5, batchK = 2)
    assert(mergeRows(m).map { case (_, l, r, _) => (l, r) } == Seq(("a", "b")))
    assert(w.select("enc").collect().head.getString(0) == s"${Sep}ab${Sep}")
  }

  test("vocabulary exhaustion stops training instead of crashing") {
    // "ab" fully merges in one round; asking for 4 returns the 1 learnable
    // merge and the fully-merged word table
    val d = docs("ab ab ab")
    val (merges, words) = Bpe.train(d, rounds = 4)
    assert(merges.collect().map(_.getInt(0)).toSeq == Seq(1))
    val enc = words.select("enc").collect().head.getString(0)
    assert(enc == s"${Sep}ab${Sep}")
    // a corpus with no pairs AT ALL is a loud error, not a silent empty
    intercept[IllegalArgumentException](Bpe.train(docs("a b c a b"), rounds = 1))
  }

  test("line terminators encode as symbols like any char — merges across them stay applicable") {
    // tokens() splits on spaces only, so real text tokens DO carry \n/\r;
    // without (?s) Java's '.' skipped them, leaving the char un-wrapped —
    // pairCounts still REPORTED the pair but the merge pattern could never
    // match, so training spun on the same un-applicable argmax
    val nl = "a\nb"
    val d = docs(s"$nl $nl $nl xy")
    val (merges, words) = Bpe.train(d, rounds = 1)
    val m = merges.collect().head
    // (a, \n) and (\n, b) both count 3; lexicographic tie-break: "\n" < "a"
    // so (\n, b)... comparing left first: "a" vs "\n" -> "\n" wins
    assert((m.getAs[String]("left_sym"), m.getAs[String]("right_sym")) == ("\n", "b"),
      s"got (${m.getString(1)}, ${m.getString(2)})")
    val enc = encOf(words)(nl)
    assert(enc == s"${Sep}a${Sep}${Sep}\nb${Sep}", s"got ${enc.replace(Sep, "|")}")
    // \r parity: Java excluded \r from '.' while RE2 excluded only \n —
    // with (?s) both wrap it; pin the engine side
    import spark.implicits._
    val encCr = Seq("x\ry").toDF("w")
      .select(Bpe.charEncode(col("w"))).collect().head.getString(0)
    assert(encCr == s"${Sep}x${Sep}${Sep}\r${Sep}${Sep}y${Sep}")
  }

  test("astral (non-BMP) characters encode as ONE symbol — engine matches RE2 codepoint semantics") {
    // Java regex '(.)' matches a full code point (surrogate pair included),
    // exactly like the DuckDB oracle's RE2 — verified empirically; this
    // test keeps that cross-engine agreement pinned
    import spark.implicits._
    val emoji = new String(Character.toChars(0x1F600)) + "ab"
    val enc = Seq(emoji).toDF("w")
      .select(Bpe.charEncode(col("w")).as("enc"))
      .collect().head.getString(0)
    assert(enc.count(_ == Sep.head) == 6, s"expected 3 double-delimited symbols, got ${enc.length}")
  }

  test("apply equals a direct recount over the trained encodings") {
    val d = docs("hello world hello", "world of wor")
    val applied = SparkEntry.queries("q_text_bpe_apply")(spark, "/root/testdata/sf0.001")
    // shape sanity on real data: every doc has >= 1 token and
    // merges can only shrink symbol counts: n_syms <= total chars
    val rows = applied.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 1L)
      assert(r.getAs[Long]("n_syms") >= r.getAs[Long]("n_tokens"),
        "a token never compresses below one symbol")
    }
    // and on the planted corpus: 4 rounds on tiny vocab still consistent
    val (_, words) = Bpe.train(d, rounds = 2)
    val direct = d.select(col("doc_id"), explode(graft.ext.TextHash.tokens(col("text"))).as("w"))
      .join(words.select(col("w"), size(Bpe.symsOf(col("enc"))).as("k")), Seq("w"))
      .groupBy("doc_id").agg(sum("k").as("n_syms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct.values.forall(_ >= 2L))
  }
}
