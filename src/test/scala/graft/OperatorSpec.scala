package graft

import graft.ext.{Multimodal, TextHash}
import graft.model.{Kind, KindModel, KindProperty}
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Unit specs for the custom operators and the kind system. */
class OperatorSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("kind model generates schemas with inheritance and nested types") {
    val m = KindModel(Seq(
      KindModel.resourceBase,
      Kind("vm", Seq(
        KindProperty("cores", "int64"),
        KindProperty("ips", "string[]"),
        KindProperty("limits", "dictionary[string, int32]")), bases = Seq("resource_base"))))
    val st = m.toStructType("vm")
    assert(st.fieldNames.toSeq ==
      Seq("id", "name", "kind", "tags", "ctime", "cores", "ips", "limits"))
    assert(st("ips").dataType.typeName == "array")
    assert(st("limits").dataType.typeName == "map")
    assert(!st("id").nullable && st("name").nullable)
  }

  test("kind model rejects property-type cycles with a model error, not StackOverflow") {
    val m = KindModel(Seq(
      Kind("a", Seq(KindProperty("child", "b"))),
      Kind("b", Seq(KindProperty("parent", "a")))))
    val e = intercept[IllegalArgumentException](m.toStructType("a"))
    assert(e.getMessage.contains("cycle"), e.getMessage)
    val self = KindModel(Seq(Kind("s", Seq(KindProperty("me", "s")))))
    val e2 = intercept[IllegalArgumentException](self.toStructType("s"))
    assert(e2.getMessage.contains("cycle"), e2.getMessage)
  }

  test("GraftExtensions surfaces dot_product in SQL") {
    GraftExtensions.install(spark)
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
    // type check errors surface with the expression's message
    val e = intercept[Exception](
      spark.sql("SELECT dot_product(array('a'), array(1.0d))").collect())
    assert(e.getMessage.contains("dot_product") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("GraftExtensions surfaces the ANN kernels in SQL with literal artifacts") {
    GraftExtensions.install(spark)
    // 1-subspace, 2-codeword codebook: v=[1,0] is codeword 0, [5,5] is 1
    val cb = "array(array(array(1.0d, 0.0d), array(5.0d, 5.0d)))"
    val code = spark.sql(s"SELECT pq_encode(array(4.9d, 5.1d), $cb, 2) AS c")
      .head().getLong(0)
    assert(code == 1L)
    val adc = spark.sql(s"SELECT pq_adc(array(1.0d, 0.0d), 1L, $cb, 2) AS d")
      .head().getDouble(0)
    assert(adc == (1.0 - 5.0) * (1.0 - 5.0) + (0.0 - 5.0) * (0.0 - 5.0))
    val cid = spark.sql(
      "SELECT centroid_assign(array(0.0d, 9.0d), array(" +
        "struct(10L, array(1.0d, 0.0d), 1.0d), " +
        "struct(20L, array(0.0d, 1.0d), 1.0d))) AS cid")
      .head().getLong(0)
    assert(cid == 20L)
    // trained artifacts must be constants: a per-row codebook is rejected
    val e = intercept[Exception](
      spark.sql(s"SELECT pq_encode(array(1.0d), array(array(array(rand()))), 1)").collect())
    assert(e.getMessage.contains("literal") || e.getMessage.contains("foldable"))
    // wrong-typed artifacts fail with the argument name, not a downstream
    // ClassCastException from executor code
    val t = intercept[Exception](
      spark.sql("SELECT pq_encode(array(1.0d), array(array(array(1, 0))), 1)").collect())
    assert(t.getMessage.contains("codebook"), t.getMessage)
    // out-of-range code nibbles name the input contract, not an AIOOBE
    val o = intercept[Exception](
      spark.sql(s"SELECT pq_adc(array(1.0d, 0.0d), 3L, $cb, 2)").collect())
    assert(o.getMessage.contains("exceeds codebook size"), o.getMessage)
    // sub_dim is narrowed exactly: 2^32 would .intValue-truncate to 0 and
    // encode every subspace to code 0 — rejected by name instead
    val big = intercept[Exception](
      spark.sql(s"SELECT pq_encode(array(1.0d), $cb, 4294967296L)").collect())
    assert(big.getMessage.contains("sub_dim"), big.getMessage)
    val neg = intercept[Exception](
      spark.sql(s"SELECT pq_adc(array(1.0d, 0.0d), 1L, $cb, 0)").collect())
    assert(neg.getMessage.contains("sub_dim"), neg.getMessage)
  }

  test("salted skew join equals the plain join on heavy-hitter data") {
    // 90% of fact rows share one key — the salting must spread the shuffle
    // without changing a single output row
    val fact = (0 until 5000).map(i => (if (i % 10 == 0) i % 7 else 42, i.toLong))
      .toDF("k", "payload")
    val dim = (0 until 50).map(i => (i, s"dim_$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "name").count().orderBy("k").collect().toSeq
    val saltedJ = graft.operators.SkewJoin.salted(fact, dim, Seq("k"), saltFactor = 16)
      .groupBy("k", "name").count().orderBy("k").collect().toSeq
    assert(saltedJ == plain && plain.nonEmpty)
  }

  test("snapshot diff classifies null-valued changes null-safely") {
    val prev = Seq((1, Option("a")), (2, None), (3, Option("c")), (4, Option("d")))
      .toDF("k", "v")
    val curr = Seq((1, Option("a")), (2, Option("x")), (3, None), (5, Option("e")))
      .toDF("k", "v")
    val got = graft.operators.SnapshotDiff.diff(prev, curr, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // null==null is unchanged; null->value and value->null are changed
    assert(got == Map(1 -> "unchanged", 2 -> "changed", 3 -> "changed",
                      4 -> "removed", 5 -> "added"))
  }

  test("snapshot diff joins NULL keys null-safely (one row, not added+removed)") {
    val prev = Seq((Option(1), "a"), (Option.empty[Int], "x")).toDF("k", "v")
    val curr = Seq((Option(1), "a"), (Option.empty[Int], "x")).toDF("k", "v")
    val got = graft.operators.SnapshotDiff.diff(prev, curr, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -999 else r.getInt(0)) -> r.getString(1)).toMap
    assert(got == Map(1 -> "unchanged", -999 -> "unchanged"))
  }

  test("asof join picks the latest right row at or before the left ts") {
    def ts(s: Int) = new Timestamp(s * 1000L)
    val left = Seq((1L, ts(10), "p1"), (1L, ts(20), "p2"), (2L, ts(5), "p3"))
      .toDF("k", "ts", "pid")
    val right = Seq((1L, ts(9), "v1"), (1L, ts(10), "v2"), (1L, ts(15), "v3"),
                    (2L, ts(6), "v4"))
      .toDF("k", "ts", "vid")
    val got = AsofJoin.leftAsof(left, right, "k", "ts", "ts",
        Seq("vid" -> "match_vid"))
      .select("pid", "match_vid").as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "p1" -> Some("v2"),  // equal ts is visible
      "p2" -> Some("v3"),  // latest earlier
      "p3" -> None))       // right row is later -> no match
  }

  test("asof join: NULL right timestamps never match; equal-ts ties pick the greatest payload") {
    def ts(s: Int) = new Timestamp(s * 1000L)
    // k=1: the only right row has a NULL ts — SQL's `r.ts <= l.ts` is
    // UNKNOWN, so the left row must get NO match (a NULLS FIRST sort
    // would otherwise phantom-carry it into every unmatched left row).
    // k=2: two right rows share ts(5) — the carried payload must be the
    // greatest payload struct (vid "vB"), deterministically.
    val left = Seq((1L, ts(10), "p1"), (2L, ts(10), "p2")).toDF("k", "ts", "pid")
    val right = Seq((1L, Option.empty[Timestamp], "vX"),
                    (2L, Option(ts(5)), "vA"), (2L, Option(ts(5)), "vB"))
      .toDF("k", "ts", "vid")
    val got = AsofJoin.leftAsof(left, right, "k", "ts", "ts",
        Seq("vid" -> "match_vid"))
      .select("pid", "match_vid").as[(String, Option[String])].collect().toMap
    assert(got == Map("p1" -> None, "p2" -> Some("vB")), s"got $got")
    // reserved names fail fast instead of silently colliding
    intercept[IllegalArgumentException] {
      AsofJoin.leftAsof(left.withColumnRenamed("pid", "__ts"), right,
        "k", "ts", "ts", Seq("vid" -> "v"))
    }
  }

  test("asof join: NULL keys never match (SQL equality), left NULL-key rows get no payload") {
    def ts(s: Int) = new Timestamp(s * 1000L)
    // SQL `l.k = r.k` is UNKNOWN for NULL keys, but Window.partitionBy
    // groups NULLs into ONE partition — without the right-side key filter
    // a NULL-key right row would phantom-match every NULL-key left row
    val left = Seq((Option.empty[Long], ts(10), "p1"), (Option(1L), ts(10), "p2"))
      .toDF("k", "ts", "pid")
    val right = Seq((Option.empty[Long], ts(5), "vN"), (Option(1L), ts(5), "v1"))
      .toDF("k", "ts", "vid")
    val got = AsofJoin.leftAsof(left, right, "k", "ts", "ts",
        Seq("vid" -> "match_vid"))
      .select("pid", "match_vid").as[(String, Option[String])].collect().toMap
    assert(got == Map("p1" -> None, "p2" -> Some("v1")), s"got $got")
  }

  test("salted skew join tolerates map-typed fact columns (hash excludes them)") {
    val fact = Seq((1, Map("a" -> "b")), (1, Map("c" -> "d")), (2, Map.empty[String, String]))
      .toDF("k", "attrs")
    val dim = Seq((1, "one"), (2, "two")).toDF("k", "name")
    val got = graft.operators.SkewJoin.salted(fact, dim, Seq("k"), saltFactor = 4)
      .groupBy("k", "name").count().orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "one", 2L), (2, "two", 1L)))
  }

  test("shingles guard short documents") {
    val df = Seq("a b", "a b c d e f").toDF("text")
      .select(TextHash.shinglesFromTokens(TextHash.tokens(col("text")), 5).as("sh"))
    val got = df.select(size(col("sh"))).as[Int].collect().toSeq
    assert(got == Seq(0, 2))
  }

  test("contaminationScore Auto picks the strategy by benchmark size") {
    import graft.ext.TextAnalysis
    import graft.ext.TextAnalysis.ContamStrategy
    // synthetic (doc_id, h) shingle rows: docs 1-3 each carry 4 hashes,
    // the benchmark covers half of doc 1's and one of doc 2's
    val corpus = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 11L),
      (3L, 30L), (3L, 31L), (3L, 32L), (3L, 33L)).toDF("doc_id", "h")
    val bench = Seq(10L, 11L, 99L).map(Tuple1(_)).toDF("h")

    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    val exact = collect(TextAnalysis.contaminationScore(corpus, bench, ContamStrategy.Exact))
    val bloom = collect(TextAnalysis.contaminationScore(corpus, bench, ContamStrategy.Bloom))

    // a small benchmark resolves Auto to the exact plan
    assert(collect(TextAnalysis.contaminationScore(corpus, bench)) == exact)
    // past the threshold Auto resolves to the bounded bloom plan
    assert(collect(TextAnalysis.contaminationScore(corpus, bench,
      ContamStrategy.Auto(maxExactHashes = 2))) == bloom)
    // bloom hits dominate exact hits (false positives only over-count)
    val exactHits = exact.map(r => r.getLong(0) -> r.getLong(2)).toMap
    bloom.foreach(r => assert(r.getLong(2) >= exactHits(r.getLong(0))))
    // exact counts are right: doc 1 hits 2 of 4, doc 2 hits 1, doc 3 none
    assert(exact.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      Seq((1L, 4L, 2L), (2L, 4L, 1L), (3L, 4L, 0L)))
  }

  test("multimodal featurizer is deterministic and normalized") {
    val media = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    val feats = Multimodal.featurize(media, Multimodal.DeterministicFakeDecoder)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(feats.length == 2 && feats.forall(_._2.length == 16))
    assert(math.abs(feats(0)._2.sum - 1.0) < 1e-9) // L1-normalized
    assert(feats(1)._2.sum == 0.0)                 // empty payload -> zero vector
    val again = Multimodal.featurize(media, Multimodal.DeterministicFakeDecoder)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(feats.map(_._2).toSeq == again.map(_._2).toSeq)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("connected components: closed under edges, canonical min id, union-find parity") {
    // seeded graph: dense near-dup clusters + one 60-node chain (worst case
    // for plain min-propagation — the label hop must collapse it in
    // O(log diameter) rounds, well inside the default iteration cap)
    val rnd = new scala.util.Random(7)
    val n = 400L
    val clusterEdges = (0 until 300).map { _ =>
      val base = rnd.nextInt(40) * 10L
      (base + rnd.nextInt(4), base + rnd.nextInt(4))
    }
    val chainEdges = (0 until 59).map(i => (340L + i, 341L + i))
    val edges = (clusterEdges ++ chainEdges).filter(e => e._1 != e._2)
      .map { case (a, b) => (a.min(b), a.max(b)) }.distinct
    val nodes = (0L until n).toDF("id")
    val got = graft.operators.ConnectedComponents
      .run(nodes, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // oracle: driver-side union-find over the same edges
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val comp = (0L until n).groupBy(find).flatMap { case (_, ids) =>
      ids.map(_ -> ids.min)
    }

    assert(got.size == n)
    assert(got == comp)                                     // exact labeling
    edges.foreach { case (a, b) => assert(got(a) == got(b)) } // closure
    got.foreach { case (id, c) =>
      assert(c <= id)                                       // canonical = min
      assert(got(c) == c)                                   // rep in own cluster
    }
  }

  test("cdc snapshot composition: folding arbitrary slices equals the full recompute") {
    import graft.operators.Events
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // exercises: normal updates, tombstone-then-revive (user 2, the
    // cumulative n_events must survive the tombstone), terminal tombstone
    // (user 3: in state, absent from published), a ts tie broken by
    // event_id (user 4), and a key born in the last slice (user 5)
    val ev = Seq(
      (1L, 100L, "view", ts(1), 1.0),
      (1L, 101L, "click", ts(2), 2.0),
      (2L, 102L, "view", ts(1), 3.0),
      (2L, 103L, "error", ts(3), 0.0),
      (2L, 104L, "purchase", ts(5), 9.0),
      (3L, 105L, "view", ts(2), 1.5),
      (3L, 106L, "error", ts(6), 0.0),
      (4L, 107L, "view", ts(4), 1.0),
      (4L, 108L, "click", ts(4), 2.0),
      (5L, 109L, "view", ts(7), 4.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_type"), r.getAs[Timestamp]("last_ts"),
          r.getAs[Long]("last_event_id"), r.getAs[Double]("last_value"),
          r.getAs[Long]("n_events"))).toMap
    val full = asMap(Events.cdcState(ev))
    // three ts-disjoint slices folded through cdcApply
    val s1 = ev.filter(col("ts") <= ts(2))
    val s2 = ev.filter(col("ts") > ts(2) && col("ts") <= ts(5))
    val s3 = ev.filter(col("ts") > ts(5))
    val folded = Events.cdcApply(Events.cdcApply(Events.cdcState(s1), s2), s3)
    assert(asMap(folded) == full, "composed state diverges from full recompute")
    // an empty changelog is the identity
    assert(asMap(Events.cdcApply(Events.cdcState(ev), ev.filter(lit(false)))) == full)
    // spot semantics: revived user 2 carries the full count through the
    // tombstone; tie on user 4 resolves to the higher event_id; the
    // terminal tombstone stays IN the state but out of the published form
    assert(full(2L) == (("purchase", ts(5), 104L, 9.0, 3L)))
    assert(full(4L)._3 == 108L)
    assert(full(3L)._1 == "error")
    val published = folded.filter(col("last_type") =!= "error")
      .collect().map(_.getAs[Long]("user_id")).toSet
    assert(published == Set(1L, 2L, 4L, 5L))
  }

  test("triangle counts: degree-ordered wedge join equals brute force, incl. hubs") {
    // seeded graph with a deliberate high-degree hub (node 0 joined to
    // everything) — the case the degree orientation exists for — plus
    // random clutter and a clean K4 whose nodes must all read coeff 1.0
    val rnd = new scala.util.Random(11)
    val hub = (1L to 30L).map(i => (0L, i))
    val k4 = Seq((100L, 101L), (100L, 102L), (100L, 103L),
      (101L, 102L), (101L, 103L), (102L, 103L))
    val clutter = (0 until 120).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong; (a, b)
    }
    val edges = (hub ++ k4 ++ clutter).filter(e => e._1 != e._2)
      .map { case (a, b) => (a.min(b), a.max(b)) }.distinct
    val got = graft.ext.Dedup.triangleCounts(edges.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

    // brute-force oracle: adjacency sets, count common neighbors per edge
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val triOf = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count { case Seq(x, y) => adj(x)(y) }
    }
    val expected = adj.filter(_._2.size >= 2).map { case (v, ns) =>
      val d = ns.size.toLong
      val t = triOf(v).toLong
      v -> ((d, t, BigDecimal(2.0 * t / (d * (d - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got == expected)
    // the K4 interior reads as perfectly clustered
    Seq(101L, 102L, 103L).foreach(v => assert(got(v)._3 == 1.0))
  }
}
