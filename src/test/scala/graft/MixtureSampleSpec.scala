package graft

import graft.ext.MixtureSample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic mixture sampling: copies land on floor(w)/ceil(w), the
  * draw is a pure function of (doc_id, salt), and realized rates track the
  * weights.
  */
class MixtureSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
  }

  test("per-doc copy count is floor(w) or ceil(w), never anything else") {
    val w = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
    val counts = MixtureSample.mixtureSample(corpus(400), w)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(counts.nonEmpty)
    counts.foreach {
      case ("src0", n) => assert(n == 2L || n == 3L)
      case ("src1", n) => assert(n == 1L) // kept docs have exactly 1 copy
      case ("src3", n) => assert(n == 1L) // default weight 1.0, no extra
      case (s, n)      => fail(s"unexpected ($s, $n)")
    }
    // src2 dropped entirely
    assert(!counts.exists(_._1 == "src2"))
  }

  test("realized rates track the weights (law of large numbers, fixed hash)") {
    val w = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
    val n = 2000 // 500 docs per source
    val byScr = MixtureSample.mixtureSample(corpus(n), w)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(math.abs(byScr("src0") - 1250.0) / 1250.0 < 0.15)
    assert(math.abs(byScr("src1") - 125.0) / 125.0 < 0.30)
    assert(byScr("src3") == 500L)
    assert(!byScr.contains("src2"))
  }

  test("sample is a pure function of (doc_id, salt): rerun identical, salt redraws") {
    val w = Map("src0" -> 0.5)
    def ids(salt: String): Set[Long] =
      MixtureSample.mixtureSample(corpus(300).filter(col("source") === "src0"), w, salt = salt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids("mix"); val b = ids("mix"); val c = ids("other-salt")
    assert(a == b)
    assert(c != a) // an independent draw almost surely differs
    // growth stability: adding docs never changes an existing doc's fate
    val bigger = MixtureSample.mixtureSample(
      corpus(600).filter(col("source") === "src0"), w, salt = "mix")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bigger.filter(_ < 300) == a.filter(_ < 300))
  }

  test("copy index is dense 1..copies") {
    val w = Map("src0" -> 3.0)
    val rows = MixtureSample.mixtureSample(corpus(40).filter(col("source") === "src0"), w)
      .groupBy("doc_id").agg(sort_array(collect_list(col("copy"))).as("cs"))
      .collect().map(_.getSeq[Long](1))
    assert(rows.nonEmpty && rows.forall(_ == Seq(1L, 2L, 3L)))
  }

  test("token budget: under-budget domains keep all; over-budget mass tracks the target") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = ((0 until 500).map(i => (i.toLong, "src0")) ++
      (500 until 520).map(i => (i.toLong, "src1")))
      .map { case (id, s) => (id, s, Seq.fill(20)("w" + rnd.nextInt(100)).mkString(" ")) }
      .toDF("doc_id", "source", "text")
    val rows = graft.ext.MixtureSample.tokenBudgetSample(
        docs, 2000L, Map("src0" -> 0.5), defaultShare = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // src1 under budget: all 20 docs kept, full ~400 token mass
    assert(rows.count(_._2 == "src1") === 20)
    // src0 over budget: kept mass within 40% of the 1000-token target
    assert(bySrc("src0") > 600L && bySrc("src0") < 1400L,
      s"src0 kept ${bySrc("src0")} tokens, target 1000")
    // deterministic: same inputs, same sample
    val again = graft.ext.MixtureSample.tokenBudgetSample(
        docs, 2000L, Map("src0" -> 0.5), defaultShare = 0.5)
      .collect().map(r => r.getLong(0)).toSet
    assert(again === rows.map(_._1).toSet)
  }

  test("negative weights are rejected") {
    intercept[IllegalArgumentException] {
      MixtureSample.mixtureSample(corpus(4), Map("src0" -> -0.1))
    }
  }

  test("cluster cap: dense cells capped at m, sparse cells intact, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // two cluster centers: a dense region (20 members) and a sparse one (2)
    val c0 = unit(Array.fill(ext.Similarity.Dim)(rnd.nextGaussian()))
    val c1 = unit(Array.fill(ext.Similarity.Dim)(rnd.nextGaussian()))
    def near(c: Array[Double]) = unit(
      c.zip(Array.fill(ext.Similarity.Dim)(rnd.nextGaussian() * 0.05))
        .map { case (a, b) => a + b }).toSeq
    val rows = (0 until 20).map(i => (i.toLong, near(c0))) ++
               (100 until 102).map(i => (i.toLong, near(c1)))
    val vecs = rows.toDF("vec_id", "v")
    // the two centers as the centroid set (norm = 1 by construction shape)
    def cent(id: Long, c: Array[Double]) = {
      var acc = 0.0; c.foreach(x => acc += x * x)
      (id, c.toSeq, math.sqrt(acc))
    }
    val cents = Seq(cent(0L, c0), cent(1L, c1))
    val kept = MixtureSample.clusterCap(vecs, cents, m = 3).collect()
    val byCell = kept.groupBy(_.getLong(0))
    assert(byCell(0L).length == 3, "dense cell must be capped at m")
    assert(byCell(1L).length == 2, "sparse cell keeps everything")
    assert(byCell(0L).head.getAs[Long]("cell_n") == 20)
    // deterministic: same keep-set on rerun
    val again = MixtureSample.clusterCap(vecs, cents, m = 3).collect()
    assert(kept.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
