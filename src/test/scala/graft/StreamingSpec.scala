package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming semantics (SURVEY.md §2.J): batch/stream equivalence for the
  * windowed aggregates, and the watermark-only behaviors (late-data drop,
  * bounded dedup state) that have no batch oracle.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Spark's FileStreamSource requires a *directory* to watch; the driver
    * testdata ships a single file, so stage it into a temp dir (testdata is
    * read-only — copy, don't symlink-in-place).
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("tumbling aggregate over a file stream equals the batch result") {
    val dir = "/root/testdata/sf0.001"
    val stream = StreamingOps.eventsStream(spark, eventsDir)
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()

    val streamed = spark.table("tumbling_out")
      .orderBy("ws", "event_type").collect().toSeq
    val batch = StreamingOps.tumblingCounts(Tables.events(spark, dir))
      .orderBy("ws", "event_type").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("session windows over a stream equal the batch result") {
    val dir = "/root/testdata/sf0.001"
    val stream = StreamingOps.eventsStream(spark, eventsDir)
    val q = StreamingOps.sessionCounts(stream)
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("session_out")
      .orderBy("session_start", "user_id").collect().toSeq
    val batch = StreamingOps.sessionCounts(Tables.events(spark, dir))
      .orderBy("session_start", "user_id").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming aggregate maintains an atomically-swapped snapshot") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-snap").toString
    val stream = StreamingOps.eventsStream(spark, eventsDir)
    val q = StreamingOps.maintainSnapshot(
      StreamingOps.tumblingCounts(stream), base, "snap_out")
    try q.processAllAvailable() finally q.stop()

    // <base>/current holds exactly the batch-computed aggregate
    val snap = spark.read.parquet(s"$base/current/snapshot")
      .orderBy("ws", "event_type").collect().toSeq
    val batch = StreamingOps.tumblingCounts(Tables.events(spark, "/root/testdata/sf0.001"))
      .orderBy("ws", "event_type").collect().toSeq
    assert(snap.nonEmpty && snap == batch)
    // no staging debris left visible to readers
    assert(!new java.io.File(s"$base/_staging").exists()
      || new java.io.File(s"$base/_staging").listFiles().isEmpty)
  }

  test("snapshot maintenance replaces current atomically across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF.toDF("ts", "event_type", "value")
      .withColumn("value", col("value"))
    val base = java.nio.file.Files.createTempDirectory("graft-multi-snap").toString
    val q = StreamingOps.maintainSnapshot(
      StreamingOps.tumblingCounts(events), base, "multi_snap")
    try {
      mem.addData((ts(1), "a", 1.0), (ts(2), "b", 2.0))
      q.processAllAvailable()
      val snap1 = spark.read.parquet(s"$base/current/snapshot").count()
      assert(snap1 == 2) // two (window, type) groups

      mem.addData((ts(3), "a", 3.0), (ts(4), "c", 4.0))
      q.processAllAvailable()
      // complete-mode aggregate: current now reflects ALL data, old
      // snapshot fully replaced (no leftover files double-counting)
      val rows = spark.read.parquet(s"$base/current/snapshot")
        .orderBy("event_type").collect()
      assert(rows.map(_.getAs[String]("event_type")).toSeq == Seq("a", "b", "c"))
      assert(rows.map(_.getAs[Long]("n")).sum == 4)
    } finally q.stop()
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = StreamingOps
      .tumblingWithWatermark(mem.toDF.toDF("ts", "event_type", "value"),
        "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), "a", 1.5), (ts(2), "a", 2.5))  // window [0,10)
      q.processAllAvailable()
      mem.addData((ts(30), "a", 0.0))             // watermark -> 25min: closes [0,10)
      q.processAllAvailable()
      mem.addData((ts(3), "late", 9.0))           // < watermark: DROPPED
      mem.addData((ts(31), "a", 0.0))
      q.processAllAvailable()
      val emitted = spark.table("late_out").collect().toSeq
      assert(emitted.map(_.getLong(2)).sum == 2)  // only the two on-time [0,10) events
      // the watermarked variant carries the SAME aggregate schema as
      // tumblingCounts — val_sum present and exact
      assert(emitted.map(_.getDouble(3)).sum == 4.0)
      assert(!emitted.exists(_.getString(1) == "late"))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with recent views only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    def df(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF.toDF("event_id", "ts", "user_id")
    val q = StreamingOps.purchasesWithRecentViews(df(purchases), df(views))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      views.addData((100L, ts(0), 1L), (101L, ts(20), 1L), (102L, ts(20), 2L))
      purchases.addData((200L, ts(30), 1L)) // views at t0 (30 min ago) and t20 qualify
      q.processAllAvailable()
      // advance both watermarks far past every buffered event so all joins
      // emit (append-mode interval joins emit only below the watermark)
      views.addData((199L, ts(300), 9L))
      purchases.addData((299L, ts(300), 9L))
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .filter(col("purchase_id") === 200L)
        .select("view_id").as[Long].collect().sorted.toSeq
      // user 1's views within [p_ts - 30min, p_ts]; user 2's view excluded
      assert(got == Seq(100L, 101L))
    } finally q.stop()
  }

  test("bounded-lookback as-of over streams equals the batch AsofJoin + staleness filter") {
    // A TRUE as-of join needs unbounded history — impossible on a stream.
    // The streaming-shape equivalent is as-of WITH BOUNDED STALENESS:
    // the watermarked interval join buffers exactly `lookback` of views,
    // and a per-purchase latest-view finisher picks the as-of match. This
    // pins that composition against the batch AsofJoin operator with the
    // same staleness filter applied — the semantics a production stream
    // actually runs, verified against the exact batch operator.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)
    // distinct view timestamps per user: as-of tie-ordering between
    // equal-ts right rows is unspecified in BOTH shapes, so don't plant one
    val viewRows = Seq((100L, ts(0), 1L), (101L, ts(20), 1L),
      (102L, ts(25), 2L), (103L, ts(28), 2L), (104L, ts(5), 3L))
    // user 3's only view is 45 min stale at purchase time — bounded
    // staleness must drop it in both shapes
    val purchaseRows = Seq((200L, ts(30), 1L), (201L, ts(29), 2L), (202L, ts(50), 3L))

    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    def df(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF.toDF("event_id", "ts", "user_id")
    val q = StreamingOps.purchasesWithRecentViews(df(purchases), df(views))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    val streamed = try {
      views.addData(viewRows: _*)
      purchases.addData(purchaseRows: _*)
      q.processAllAvailable()
      // sentinels push both watermarks past every buffered event so the
      // append-mode interval join emits everything
      views.addData((998L, ts(300), 9L))
      purchases.addData((999L, ts(300), 9L))
      q.processAllAvailable()
      spark.table("asof_stream")
        .filter(col("purchase_id") < 900L)
        .groupBy("purchase_id")
        .agg(max_by(col("view_id"), col("v_ts")).as("view_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally q.stop()

    val batch = operators.AsofJoin.leftAsof(
        purchaseRows.toDF("event_id", "ts", "user_id").select("user_id", "ts", "event_id"),
        viewRows.toDF("event_id", "ts", "user_id").select("user_id", "ts", "event_id"),
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightCols = Seq("event_id" -> "view_id", "ts" -> "view_ts"))
      .filter(col("view_id").isNotNull &&
        col("view_ts") >= col("ts") - expr("INTERVAL 30 minutes"))
      .select(col("event_id"), col("view_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(batch == Map(200L -> 101L, 201L -> 103L), "batch as-of planting failed")
    assert(streamed == batch,
      s"stream as-of $streamed diverges from batch AsofJoin $batch")
  }

  test("dropDuplicatesWithinWatermark dedups within the state horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF.toDF("event_id", "ts")
    val q = StreamingOps.dedupWithinWatermark(events, "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(1)))
      q.processAllAvailable()
      mem.addData((1L, ts(2))) // duplicate within watermark: dropped
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-user running spend across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps.{UserEvent, UserSpend}
    val mem = MemoryStream[UserEvent]
    val q = StreamingOps.runningSpend(mem.toDS())
      .writeStream.format("memory").queryName("spend_out")
      .outputMode("update").start()
    try {
      mem.addData(UserEvent(1, "purchase", 60.0), UserEvent(1, "purchase", 20.0),
                  UserEvent(2, "purchase", 10.0), UserEvent(1, "view", 999.0))
      q.processAllAvailable()
      // batch 2: user 1 crosses 100 HERE (80 -> 130); user 2 stays low
      mem.addData(UserEvent(1, "purchase", 50.0), UserEvent(2, "purchase", 5.0))
      q.processAllAvailable()
      // batch 3: user 1 already crossed — no new flag
      mem.addData(UserEvent(1, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("spend_out").as[UserSpend].collect()
        .groupBy(_.user_id).view.mapValues(_.sortBy(_.n_purchases)).toMap
      assert(out(1L).map(s => (s.n_purchases, s.total, s.crossed_100)) ===
        Seq((2L, 80.0, false), (3L, 130.0, true), (4L, 131.0, false)))
      assert(out(2L).map(s => (s.n_purchases, s.total, s.crossed_100)) ===
        Seq((1L, 10.0, false), (2L, 15.0, false)))
    } finally q.stop()
  }

  test("CDC latest-wins state across batches equals the batch changelog apply") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingOps.{CdcEvent, CdcState}
    val sf = "/root/testdata/sf0.001"
    val all = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .as[CdcEvent].collect()
    val mem = MemoryStream[CdcEvent]
    val q = StreamingOps.cdcLatestState(mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      // three arbitrary micro-batch splits; latest-wins is a max over a
      // set, so the split must not matter
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // each touched key re-emits its state per batch with monotone
      // n_events — the final state is the max-n_events row per user
      val streamed = spark.table("cdc_out").as[CdcState].collect()
        .groupBy(_.user_id).map(_._2.maxBy(_.n_events))
        .filter(_.last_type != "error") // tombstone serving filter
        .map(s => (s.user_id, s.last_type, s.last_ts,
          BigDecimal(s.last_value).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s.n_events))
        .toSet
      val batch = SparkEntry.queries("q_events_cdc_apply")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          r.getDouble(3), r.getLong(4)))
        .toSet
      assert(streamed == batch,
        s"stream state diverges from batch apply: ${streamed.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("per-row minhash bands equal the batch groupBy signature") {
    // the streaming operator computes signatures inside the row; the batch
    // dedup pipeline aggregates exploded shingles — identical bands per doc
    import graft.ext.TextHash._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val perRow = StreamingOps.minhashBanded(docs)
      .filter(col("key.k1").isNotNull) // shingle-less docs have no batch row
    val aggs = MinhashPerms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % Mersenne31).as(s"sig_$i")
    }
    val batchBands = docs
      .select(col("doc_id"), explode(shinglesFromTokens(tokens(col("text")), 5)).as("sh"))
      .select(col("doc_id"), (h48(col("sh")) % Mersenne31).as("h"))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), posexplode(array((0 until 4).map { b =>
        struct(col(s"sig_${2 * b}").as("k1"), col(s"sig_${2 * b + 1}").as("k2"))
      }: _*)).as(Seq("band", "key")))
    assert(perRow.count() > 0)
    assert(perRow.exceptAll(batchBands).isEmpty && batchBands.exceptAll(perRow).isEmpty)
  }

  test("streaming ANN index rows equal a batch rebuild, micro-batch by micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Similarity
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = Similarity.centroidSet(corpus, 10)
    val cb = Similarity.pqCodebook(corpus)
    val rows = corpus.select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()

    val mem = MemoryStream[(Long, Seq[Double])]
    val incoming = mem.toDF.toDF("vec_id", "v")
    val q = StreamingOps.annIndexRows(incoming, cents, cb)
      .writeStream.format("memory").queryName("annidx_out")
      .outputMode("append").start()
    try {
      // three uneven micro-batches: the upsert is per-row, so batching
      // must not change a single index row
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("annidx_out")
      val batch = StreamingOps.annIndexRows(corpus, cents, cb)
      assert(streamed.count() == rows.length)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streaming index rows diverge from the batch rebuild")
    } finally q.stop()
  }

  test("streaming ANN probe flags the same neighbors as the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Similarity
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = Similarity.centroidSet(corpus, 10)
    val cb = Similarity.pqCodebook(corpus)
    val index = StreamingOps.annIndexRows(corpus, cents, cb).cache()
    val probeRows = corpus.filter(col("vec_id") < 8)
      .as[(Long, Seq[Double])].collect()
    // threshold wide enough to flag real candidates on random vectors
    val maxDist = 2.5

    val mem = MemoryStream[(Long, Seq[Double])]
    val incoming = mem.toDF.toDF("vec_id", "v")
    val q = StreamingOps.incrementalAnn(incoming, index, cents, cb, nprobe = 2, maxDist)
      .writeStream.format("memory").queryName("annprobe_out")
      .outputMode("append").start()
    try {
      mem.addData(probeRows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("annprobe_out")
      val batch = StreamingOps.incrementalAnn(
        corpus.filter(col("vec_id") < 8), index, cents, cb, 2, maxDist)
      assert(batch.count() > 0, "test threshold flags nothing — widen maxDist")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streaming probe output diverges from the batch operator")
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming incremental dedup flags near-dups of the static corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val freshText = "one two three four five six seven eight nine ten " * 5
    val corpus = Seq((10L, corpusText), (11L, "x " + corpusText))
      .toDF("doc_id", "text")
    // the incrementally-maintainable structure: distinct (band, key) index
    val index = StreamingOps.minhashBanded(corpus).select("band", "key").distinct()

    val mem = MemoryStream[(Long, String)]
    val incoming = mem.toDF.toDF("doc_id", "text")
    val q = StreamingOps.incrementalDedup(incoming, index)
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    try {
      mem.addData((100L, corpusText + " slightly changed"), (101L, freshText))
      q.processAllAvailable()
      val flagged = spark.table("incdedup_out")
        .select("doc_id").distinct().as[Long].collect().sorted.toSeq
      assert(flagged == Seq(100L)) // near-copy flagged, fresh doc passes
    } finally q.stop()
  }

  test("streaming dedup probe against the AT-REST band index equals the batch probe") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.DedupIndex
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val freshText = "one two three four five six seven eight nine ten " * 5
    val corpus = Seq((10L, corpusText), (11L, "x " + corpusText))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-streamidx").toString
    DedupIndex.write(StreamingOps.minhashBanded(corpus), dir)
    val stored = DedupIndex.load(spark, dir)

    val batchDocs = Seq((100L, corpusText + " slightly changed"), (101L, freshText))
    val mem = MemoryStream[(Long, String)]
    // the SAME stored bytes feed the stream-static join (via asBandKey)
    // and the partition-pruned batch probe
    val q = StreamingOps.incrementalDedup(
        mem.toDF.toDF("doc_id", "text"), DedupIndex.asBandKey(stored))
      .writeStream.format("memory").queryName("incdedup_atrest_out")
      .outputMode("append").start()
    try {
      mem.addData(batchDocs: _*)
      q.processAllAvailable()
      val streamed = spark.table("incdedup_atrest_out")
        .groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = DedupIndex.probe(stored,
          StreamingOps.minhashBanded(batchDocs.toDF("doc_id", "text")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch.keySet == Set(100L), "planting failed")
      assert(streamed == batch,
        s"streaming band hits $streamed diverge from batch probe $batch")
    } finally q.stop()
  }

  test("streaming substring probe against the AT-REST window index equals batch hits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.{SubstringDedup, SubstringIndex}
    val corpusText =
      "the quick brown fox jumps over the lazy dog while the band plays on " * 3
    val corpus = Seq((10L, corpusText), (11L, "zzz " + corpusText.take(90)))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-streamsubidx").toString
    SubstringIndex.write(corpus, dir)
    val stored = SubstringIndex.load(spark, dir)

    // doc 100 embeds a verbatim 60-char corpus substring; doc 101 is fresh
    val batchDocs = Seq(
      (100L, "prefix words here " + corpusText.substring(10, 70) + " suffix tail"),
      (101L, "completely novel content with no overlap against anything stored x1"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.incrementalSubstring(
        mem.toDF.toDF("doc_id", "text"), stored)
      .writeStream.format("memory").queryName("incsub_out")
      .outputMode("append").start()
    try {
      mem.addData(batchDocs: _*)
      q.processAllAvailable()
      val streamed = spark.table("incsub_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch equivalent: the same stored bytes, same hash derivation
      val batch = SubstringIndex.withBucket(
          SubstringDedup.windowHashes(batchDocs.toDF("doc_id", "text"),
            SubstringDedup.K, 1))
        .join(stored, Seq("bucket", "h1", "h2"))
        .select("doc_id", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty && batch.forall(_._1 == 100L), "planting failed")
      assert(streamed == batch,
        s"streaming substring hits diverge from batch (${streamed.size} vs ${batch.size})")
    } finally q.stop()
  }

  test("mixture sampling applied to a stream equals the batch sample (stateless projection)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.MixtureSample
    val w = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
    val docs = (0 until 120).map(i => (i.toLong, s"src${i % 4}", s"doc $i"))
    val mem = MemoryStream[(Long, String, String)]
    val q = MixtureSample.mixtureSample(
        mem.toDF.toDF("doc_id", "source", "text"), w)
      .writeStream.format("memory").queryName("mix_out")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(60): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(60): _*) // a second micro-batch changes nothing
      q.processAllAvailable()
      val streamed = spark.table("mix_out")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val batch = MixtureSample.mixtureSample(
          docs.toDF("doc_id", "source", "text"), w)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(streamed == batch,
        s"streaming mixture diverges from batch (${streamed.size} vs ${batch.size})")
    } finally q.stop()
  }

  test("trained scorers gate a stream: classifier and DSIR scores equal batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.{Bm25, Dsir, QualityClassifier}
    // model artifacts trained on a static reference corpus (batch)
    val rnd = new scala.util.Random(59)
    val vocabA = Vector("alpha", "beta", "gamma", "delta")
    val vocabB = Vector("spam", "junk", "noise", "blob")
    def doc(v: Vector[String]) =
      Seq.fill(25)(v(rnd.nextInt(v.size))).mkString(" ")
    val ref = ((0 until 40).map(i => (i.toLong, "src0", doc(vocabA))) ++
               (0 until 40).map(i => (100L + i, "junk", doc(vocabB))))
      .toDF("doc_id", "source", "text")
    val (w, bias) = QualityClassifier.train(ref)
    val lam = Dsir.lambdaTable(ref, col("source") === "src0")
    val (bmStats, avgdl) = Bm25.termStats(ref, Seq("alpha", "gamma"))

    // both scores are pure projections over the frozen artifacts, so they
    // apply to an unbounded stream unchanged — the admission-gate shape
    val incoming = (200 until 240).map(i =>
      (i.toLong, if (i % 2 == 0) doc(vocabA) else doc(vocabB)))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text")
      .select(col("doc_id"),
        QualityClassifier.scoreInline(col("text"), w, bias).as("quality"),
        Dsir.scoreInline(col("text"), lam).as("logw"),
        Bm25.scoreInline(col("text"), bmStats, avgdl).as("bm25"))
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      mem.addData(incoming.take(20): _*)
      q.processAllAvailable()
      mem.addData(incoming.drop(20): _*)
      q.processAllAvailable()
      val streamed = spark.table("gate_out").collect()
        .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
      val batch = incoming.toDF("doc_id", "text")
        .select(col("doc_id"),
          QualityClassifier.scoreInline(col("text"), w, bias).as("quality"),
          Dsir.scoreInline(col("text"), lam).as("logw"),
          Bm25.scoreInline(col("text"), bmStats, avgdl).as("bm25"))
        .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(streamed == batch, "streaming gate scores diverge from batch")
      // and the gates actually separate: A-vocab docs beat B-vocab docs
      // on both signals
      val (a, b) = batch.partition(_._1 % 2 == 0)
      assert(a.values.map(_._1).min > b.values.map(_._1).max,
        "classifier gate does not separate the stream")
      assert(a.values.map(_._2).min > b.values.map(_._2).max,
        "DSIR gate does not separate the stream")
      // BM25 terms come from vocab A, so A-docs must outscore B-docs
      // (which contain neither term and score exactly 0)
      assert(a.values.map(_._3).min > 0.0 && b.values.forall(_._3 == 0.0),
        "BM25 gate does not separate the stream")
    } finally q.stop()
  }

  test("streaming kNN labeling: probes voted against the static index equal batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Similarity
    val rnd = new scala.util.Random(67)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = (0 until 3).map(_ => unit(Array.fill(Similarity.Dim)(rnd.nextGaussian())))
    def near(c: Int) = unit(centers(c).zip(
      Array.fill(Similarity.Dim)(rnd.nextGaussian() * 0.05)).map { case (a, b) => a + b }).toSeq
    val corpusRows = for { c <- 0 until 3; i <- 0 until 25 }
      yield ((c * 25 + i).toLong, c, near(c))
    val corpus = corpusRows.toDF("vec_id", "label", "v")
    val cents = Similarity.centroidSet(corpus.select(col("vec_id"), col("v")), 7)
    val cb = Similarity.pqCodebook(corpus.select(col("vec_id"), col("v")))
    val index = Similarity.indexRows(corpus.select(col("vec_id"), col("v")), cents, cb)
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id")).cache()
    val labelOf = corpusRows.map(r => r._1 -> r._2).toMap

    // probe stream: fresh vectors near known clusters
    val probeRows = (0 until 15).map(i => (1000L + i, i % 3, near(i % 3)))
    def cands(probes: org.apache.spark.sql.DataFrame) =
      StreamingOps.incrementalAnn(probes, index, cents, cb, nprobe = 2,
          maxDist = Double.MaxValue)
        .join(corpus.select(col("vec_id").as("cand"), col("label")), Seq("cand"))
        .select(col("qid"), col("cand"), col("label"), col("adc").as("dist"))
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = Similarity.knnVoteByDistance(
        cands(mem.toDF.toDF("vec_id", "v")), k = 10)
      .writeStream.format("memory").queryName("knn_stream")
      .outputMode("update").start()
    try {
      mem.addData(probeRows.take(8).map(r => (r._1, r._3)): _*)
      q.processAllAvailable()
      mem.addData(probeRows.drop(8).map(r => (r._1, r._3)): _*)
      q.processAllAvailable()
      val streamed = spark.table("knn_stream")
        .groupBy("qid").agg(last("pred_label").as("pred_label"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = Similarity.knnVoteByDistance(
          cands(probeRows.map(r => (r._1, r._3)).toDF("vec_id", "v")), k = 10)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batch, "streaming kNN vote diverges from batch")
      // and the labels are the planted truth
      probeRows.foreach { case (qid, c, _) =>
        assert(batch(qid) == c, s"probe $qid labeled ${batch(qid)}, planted $c")
      }
      assert(labelOf.nonEmpty) // silence unused warning paths
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming curation funnel: gated survivors equal the batch report") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.{CurationReport, TextHash}
    val good = (1 to 60).map(i => s"w$i").mkString(" ")
    val benchText = (200 to 260).map(i => s"ev$i").mkString(" ")
    val corpus = Seq(
      (1L, "web", good), (2L, "web", good) /* dup */,
      (3L, "web", "too short"), (4L, "web", s"x $benchText") /* leak */,
      (5L, "books", good + " tail"), (6L, "books", good + " tail2"))
    val benchDocs = Seq((0L, "bench", benchText))
    val all = (benchDocs ++ corpus).toDF("doc_id", "source", "text")

    // batch truth: the oracle-checked report
    val rep = CurationReport.report(all, col("source") === "bench")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap

    // streaming form: quality + decontamination are stateless projections
    // (the bench shingle set rides along as a bounded literal — the same
    // data the batch plan broadcasts); keep-first dedup is streaming
    // dropDuplicates state on the content hash
    val benchHashes = benchDocs.toDF("doc_id", "source", "text")
      .select(explode(TextHash.shinglesFromTokens(
        TextHash.tokens(col("text")), graft.ext.Dedup.K)).as("sh"))
      .select(TextHash.h48(col("sh")).as("h"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val mem = MemoryStream[(Long, String, String)]
    val toks = TextHash.tokens(col("text"))
    val q = mem.toDF.toDF("doc_id", "source", "text")
      .filter(expr("length(text) - length(replace(text, ' ', '')) + 1")
        >= CurationReport.MinTokens)
      .filter(!arrays_overlap(
        transform(TextHash.shinglesFromTokens(toks, graft.ext.Dedup.K),
                  sh => TextHash.h48(sh)),
        typedLit(benchHashes)))
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      mem.addData(corpus.take(3): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val survivors = spark.table("funnel_out")
        .groupBy("source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(survivors == rep.filter(_._2 > 0),
        s"streaming funnel $survivors vs batch report $rep")
    } finally q.stop()
  }

  test("BPE token-count gate on a stream equals the batch apply (vocab lookup join)") {
    // the trained BPE word table is a frozen artifact like the classifier
    // weights: applying it to a stream is a stream-static equi-join (plus
    // the stateless explode), so per-document symbol counts must match the
    // batch q_text_bpe_apply shape exactly — the admission-gate pattern
    // ("drop documents that compress too well / too poorly") on live data
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Bpe
    val ref = Seq((0L, "abab abab abc abc abc"), (1L, "aaa aa xy xy zq"))
      .toDF("doc_id", "text")
    val (_, words) = Bpe.train(ref, rounds = 2)
    val vocab = Bpe.vocabOf(words)

    val incoming = Seq((10L, "abc abab xy"), (11L, "aaa zq zq unseen"))

    val mem = MemoryStream[(Long, String)]
    val q = Bpe.applyVocab(mem.toDF.toDF("doc_id", "text"), vocab)
      .writeStream.format("memory").queryName("bpe_gate")
      .outputMode("complete").start()
    val streamed = try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      spark.table("bpe_gate").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    } finally q.stop()
    val batch = Bpe.applyVocab(incoming.toDF("doc_id", "text"), vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // in-vocab counts reflect the learned merges: round 1 (a,b); round 2
    // ties (a,a)=3 with (ab,c)=3 and breaks lexicographically to (a,a) —
    // so abc=[ab,c]=2, abab=2, xy=2 symbols
    assert(batch(10L) == ((3L, 6L)), s"doc 10: $batch")
    // the out-of-vocab token ("unseen") char-falls-back to 6 symbols in
    // BOTH paths — aaa=[aa,a](2) + zq(2) + zq(2) + unseen(6)
    assert(batch(11L) == ((4L, 12L)), s"doc 11: $batch")
  }

  test("at-rest tokenizer id-encodes a stream bit-identically to batch (frozen id table)") {
    // the stored tokenizer (words.parquet + syms.parquet incl. the
    // char-fallback page) is a frozen artifact: id-encoding a stream is
    // two stream-static equi-joins plus a per-document aggregate, and the
    // id assignment must come from the ARTIFACT, not a per-batch re-rank —
    // so novel words in the stream cannot renumber anything
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Bpe
    val ref = Seq((0L, "ab ab ab cd cd abc abc")).toDF("doc_id", "text")
    val (_, words) = Bpe.train(ref, rounds = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-stream-tok").toString
    Bpe.writeTokenizer(words, dir)
    val (wStored, idsStored) = Bpe.loadTokenizer(spark, dir)

    // novel word "ba" (known chars) + unknown char word "zq" + in-vocab
    val incoming = Seq((10L, "abc ba ab"), (11L, "zq cd cd"))
    val mem = MemoryStream[(Long, String)]
    val q = Bpe.encodeWith(mem.toDF.toDF("doc_id", "text"), wStored, idsStored)
      .select(col("doc_id"), concat_ws(",", transform(col("token_ids"),
        x => x.cast("string"))).as("ids"))
      .writeStream.format("memory").queryName("bpe_encode_stream")
      .outputMode("complete").start()
    val streamed = try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      spark.table("bpe_encode_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    } finally q.stop()
    val batch = Bpe.encodeWith(incoming.toDF("doc_id", "text"), wStored, idsStored)
      .select(col("doc_id"), concat_ws(",", transform(col("token_ids"),
        x => x.cast("string"))).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // full-length sequences: every word resolved (char page or UnkId)
    assert(streamed(10L).split(",").length >= 3, s"got $streamed")
    assert(streamed(11L).split(",").contains(Bpe.UnkId.toString), s"got $streamed")
  }

  test("LM tercile admission gate on a stream equals the batch bucketing (boundary scalars)") {
    // the CCNet head/middle/tail cut as a FROZEN artifact: batch training
    // yields two (score, doc_id) boundary scalars (DistributedRank
    // .boundariesDesc); serving is a stream-static score join plus a pure
    // projection (bucketByBoundaries) — zero windows, zero state.
    // Streaming the trained corpus back through the gate must reproduce
    // the batch tercile assignment bit-for-bit, score ties included.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.DistributedRank
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "the cat sat on the mat"), // exact dup of doc 0: score tie
      (3L, "a cat and a dog and a bird"),
      (4L, "the bird sat on the dog"),
      (5L, "a dog on a log on a mat")).toDF("doc_id", "text")
    import graft.ext.LmGate
    val (c12, c1) = LmGate.countTables(corpus)
    val batchScored = LmGate.score(corpus, c12, c1)
      .select(col("doc_id"), col("avg_logprob"))
    val batchBuckets = DistributedRank.ntileDesc(batchScored, "avg_logprob", "doc_id", 3)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    spark.catalog.clearCache()
    val bs = DistributedRank.boundariesDesc(batchScored, "avg_logprob", "doc_id", 3)
    spark.catalog.clearCache()

    val mem = MemoryStream[(Long, String)]
    val gated = LmGate.Gate(c12, c1, bs).bucketed(mem.toDF.toDF("doc_id", "text"))
    val q = gated.writeStream.format("memory").queryName("ppl_gate")
      .outputMode("complete").start()
    val streamed = try {
      mem.addData(corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      spark.table("ppl_gate").collect()
        .map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    } finally q.stop()
    assert(streamed == batchBuckets, s"stream $streamed vs batch $batchBuckets")
    // every doc gated (incl. the tied pair, split deterministically by id)
    assert(streamed.keySet == (0L to 5L).toSet)
  }

  test("Kneser-Ney admission gate on a stream equals the batch bucketing, OOV included") {
    // the KN leg of the admission pattern: a stored-mode kneser gate's
    // bucketed() is the same stream-static joins + boundary projection —
    // zero windows — and the OOV-robust scoring means a fully novel
    // streaming document still gates (tail bucket) instead of dropping.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.DistributedRank
    import graft.ext.LmGate
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "the cat sat on the mat"), // exact dup of doc 0: score tie
      (3L, "a cat and a dog and a bird"),
      (4L, "the bird sat on the dog"),
      (5L, "a dog on a log on a mat")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-kn-stream").toString
    LmGate.write(corpus, tmp, mode = LmGate.Mode.Kneser)
    val gate = LmGate.load(spark, tmp)
    assert(gate.mode == LmGate.Mode.Kneser)
    val (c12, c1) = LmGate.countTables(corpus)
    val batchBuckets = DistributedRank.ntileDesc(
        LmGate.scoreKneserSmoothed(corpus, c12, c1)
          .select(col("doc_id"), col("avg_logprob")),
        "avg_logprob", "doc_id", 3)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    spark.catalog.clearCache()

    val mem = MemoryStream[(Long, String)]
    val gated = gate.bucketed(mem.toDF.toDF("doc_id", "text"))
    val q = gated.writeStream.format("memory").queryName("kn_gate")
      .outputMode("complete").start()
    val streamed = try {
      mem.addData(corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        :+ (99L, "zq zork blurp entirely novel"): _*)
      q.processAllAvailable()
      spark.table("kn_gate").collect()
        .map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    } finally q.stop()
    assert(streamed - 99L == batchBuckets, s"stream $streamed vs batch $batchBuckets")
    // the all-unseen doc scores via the continuation floor and lands in
    // the open tail bucket — never dropped from a KN admission stream
    assert(streamed(99L) == 3, s"novel doc bucket: ${streamed.get(99L)}")
  }

  test("token-budget admission gate on a stream equals the batch cut") {
    // the batch q_sample_quality_budget cut freezes into ONE boundary
    // scalar — the (quality, doc_id) pair of the LAST admitted document —
    // and streaming admission is bucketByBoundaries with that single
    // boundary: bucket 1 = admitted. Quality is a per-row projection
    // (no aggregation), so the gate even runs in APPEND mode. Streaming
    // the corpus back through the frozen gate must reproduce the batch
    // selection exactly, ties included.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.TextHash.tokens
    import graft.operators.DistributedRank
    val stop = Seq("the", "a", "of", "and")
    def scored(df: org.apache.spark.sql.DataFrame) = {
      val toks = tokens(col("text"))
      df.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(aggregate(transform(toks, t => when(t.isin(stop: _*), 1).otherwise(0)),
            lit(0), (x, y) => x + y).cast("double") / size(toks) * 0.5
          + least(size(toks), lit(400)) / 400.0 * 0.5, 6).as("quality"))
    }
    val corpus = Seq(
      (0L, "the cat sat on the mat today"),
      (1L, "dog log fog bog"),
      (2L, "the cat sat on the mat today"), // dup of 0: quality tie
      (3L, "a dog and a cat and the bird of the house"),
      (4L, "word " * 30 + "end"),
      (5L, "the a of and the a of and")).toDF("doc_id", "text")
    val budget = 30L
    val admitted = DistributedRank
      .cumSumDesc(scored(corpus), "quality", "doc_id", "n_tokens", "cum")
      .filter(col("cum") <= budget)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    spark.catalog.clearCache()
    assert(admitted.nonEmpty && admitted.length < 6,
      s"budget must cut a strict subset, got ${admitted.length}")
    // the frozen cutoff: minimal (quality DESC, doc_id ASC) among admitted
    val cutoff = admitted.map { case (id, q) => (q, id) }
      .minBy { case (q, id) => (q, -id.toDouble) } match { case (q, id) => (q, id) }
    // order: last admitted = smallest quality, largest id among its ties
    val mem = MemoryStream[(Long, String)]
    val q = DistributedRank.bucketByBoundaries(
        scored(mem.toDF.toDF("doc_id", "text")), "quality", "doc_id", Seq(cutoff))
      .filter(col("bucket") === 1)
      .writeStream.format("memory").queryName("budget_gate")
      .outputMode("append").start()
    val streamed = try {
      mem.addData(corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      spark.table("budget_gate").collect().map(_.getAs[Long]("doc_id")).toSet
    } finally q.stop()
    assert(streamed == admitted.map(_._1).toSet,
      s"stream admitted $streamed vs batch ${admitted.map(_._1).toSet}")
  }

  test("multimodal header decode on a stream equals batch (image, audio, video)") {
    // all three header parsers are stateless per-row decodes inside
    // mapPartitions, so they run unchanged over a stream — the ingest
    // shape of a production media pipeline (catalog blobs as they land)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ext.Multimodal
    val blobs = Seq(
      (1L, Multimodal.encodeImage(20, 10, "png_rgb")),
      (2L, Multimodal.encodeWav(16000, 2, 150)),
      (3L, Multimodal.encodeMp4(1, 90000, 123456L, 2)),
      (4L, "not media".getBytes("UTF-8")))

    def collectTable(name: String) =
      spark.table(name).collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    def pin(name: String, table: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val mem = MemoryStream[(Long, Array[Byte])]
      val q = table(mem.toDF.toDF("doc_id", "blob"))
        .writeStream.format("memory").queryName(s"mm_$name")
        .outputMode("append").start()
      val streamed = try {
        mem.addData(blobs: _*)
        q.processAllAvailable()
        collectTable(s"mm_$name")
      } finally q.stop()
      val batch = table(blobs.toDF("doc_id", "blob")).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(streamed == batch, s"$name: stream $streamed vs batch $batch")
      assert(batch(4L).forall(_ == null),
        s"$name: garbage blob must yield ALL-null fields, got ${batch(4L)}")
    }
    pin("img", Multimodal.headerTable)
    pin("wav", Multimodal.wavHeaderTable)
    pin("mp4", Multimodal.mp4HeaderTable)
  }

  test("DSIR inline score equals the batch operator's logw exactly") {
    import spark.implicits._
    import graft.ext.Dsir
    val rnd = new scala.util.Random(61)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum")
    val docs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val target = col("doc_id") % 7 === 0
    val lam = Dsir.lambdaTable(docs, target)
    val inline = docs.filter(!target)
      .select(col("doc_id"), Dsir.scoreInline(col("text"), lam).as("logw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val grouped = Dsir.select(docs, target, k = 60)
      .select(col("doc_id"), col("logw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inline.keySet == grouped.keySet)
    // EXACT equality: same multiset of 9dp λ values, decimal-summed on
    // both paths — not approximately, bit-for-bit
    inline.foreach { case (id, v) =>
      assert(v == grouped(id), s"doc $id: inline $v vs grouped ${grouped(id)}")
    }
  }

  test("composed admission gate: any micro-batch split equals the batch admit, on fresh AND appended trees") {
    // The streaming face of the pipeline rows' admission stage, on the
    // SAME corpus split q_pipeline_stored gates: quality (stored LmGate)
    // → novelty (at-rest band tree) → decontam (at-rest window tree), one
    // shared derivation (Pipeline.admittedIdsOf) driven per micro-batch
    // through StreamingOps.admissionGate. Pins (a) the streamed union
    // over an arbitrary 3-way split == the single-shot batch admit, (b)
    // the same equality against an APPENDED dedup tree (duplicate keys on
    // disk — the incrementalDedup contract note's hazard, closed here by
    // probe-side dedup, "dedupe in the gate"), and (c) every gate did
    // work (non-vacuous funnel at fixture scale).
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{Dedup, DedupIndex, LmGate, Pipeline, SubstringIndex}
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val isBatch = col("doc_id") % 4 === 3 && col("doc_id") < Pipeline.BatchIdBound
    val corpus = docs.filter(!isBatch)
    val batch = docs.filter(isBatch)
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-admit-stream").toString
      LmGate.write(corpus, s"$root/gate",
        mode = LmGate.Mode.Addone, maxBigrams = Pipeline.GateCap)
      DedupIndex.write(banded.filter(!isBatch), s"$root/dedup")
      SubstringIndex.write(corpus, s"$root/substr")
      // the appended-tree variant: same keys, but half written + half
      // appended — cross-batch duplicate keys legitimately on disk
      DedupIndex.write(banded.filter(!isBatch && col("doc_id") % 2 === 0),
        s"$root/dedup2")
      DedupIndex.append(banded.filter(!isBatch && col("doc_id") % 2 =!= 0),
        s"$root/dedup2")

      val gate = LmGate.load(spark, s"$root/gate")
      val batchAdmit = Pipeline.admittedIdsOf(Some(gate), batch,
          banded.filter(isBatch), s"$root/dedup", s"$root/substr")
        .collect().map(_.getLong(0)).toSet

      // funnel non-vacuity (same bar as PipelineSpec at this scale)
      val nBatch = batch.count()
      assert(batchAdmit.nonEmpty && batchAdmit.size < nBatch,
        s"admission vacuous: ${batchAdmit.size} of $nBatch")

      def runStream(dedupPath: String, out: String): Set[Long] = {
        val mem = MemoryStream[(Long, String)]
        val q = StreamingOps.admissionGate(
          mem.toDF.toDF("doc_id", "text"),
          Some(s"$root/gate"), dedupPath, s"$root/substr", out,
          queryName = s"admit-${new java.io.File(out).getName}")
        try {
          val rows = batch.select("doc_id", "text").collect()
            .map(r => (r.getLong(0), r.getString(1)))
          val (a, rest) = rows.splitAt(rows.length / 3)
          val (b, c) = rest.splitAt(rest.length / 2)
          Seq(a, b, c).foreach { chunk =>
            mem.addData(chunk.toIndexedSeq: _*)
            q.processAllAvailable()
          }
          spark.read.parquet(out).select("doc_id")
            .collect().map(_.getLong(0)).toSet
        } finally q.stop()
      }

      val streamed = runStream(s"$root/dedup", s"$root/out1")
      assert(streamed == batchAdmit,
        s"streamed admission (${streamed.size}) diverges from batch (${batchAdmit.size})")
      val streamedAppended = runStream(s"$root/dedup2", s"$root/out2")
      assert(streamedAppended == batchAdmit,
        "streamed admission against the APPENDED tree diverges — " +
          "duplicate index keys leaked through the gate")
      // the sink records batch_id per admission (the replay-dedup key)
      val bids = spark.read.parquet(s"$root/out1")
        .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
      assert(bids.size > 1, "stream collapsed into one micro-batch — split vacuous")
    } finally { banded.unpersist(); () }
  }

  test("streaming ingest loop: micro-batch folds feed forward — two chunks equal the batch two-cycle pipeline") {
    // The stream IS the steady-state loop: each micro-batch's admitted
    // remainder is APPENDED into the trees the next micro-batch probes.
    // Pinned against the strongest available truth — q_pipeline_cycles'
    // own recorded per-cycle admission sets (driver-oracle-checked) on
    // the identical arrival split — plus bit-equality of the folded BM25
    // corpus scalars. A fold that lost rows, a decision derived after
    // the append (the lineage hazard), or a probe that missed the
    // previous micro-batch's keys could not match.
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{Bm25Index, Dedup, DedupIndex, Pipeline, StoredArtifacts, SubstringIndex}
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries("q_pipeline_cycles")(spark, sf).collect()
    val pipeRoot = StoredArtifacts.of(s"pipeline-cycles|$sf")(_ =>
      fail("pipeline-cycles artifact should already exist"))
    def admittedOf(p: String) =
      spark.read.parquet(p).collect().map(_.getLong(0)).toSet
    val cycle1 = admittedOf(s"$pipeRoot/admitted1.parquet")
    val cycle2 = admittedOf(s"$pipeRoot/admitted2.parquet")

    val docs = Tables.documents(spark, sf)
    val isBatch = col("doc_id") % 4 === 3 && col("doc_id") < Pipeline.BatchIdBound
    val corpus = docs.filter(!isBatch)
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-ingest-loop").toString
      DedupIndex.write(banded.filter(!isBatch), s"$dir/dedup")
      SubstringIndex.write(corpus, s"$dir/substr")
      Bm25Index.write(corpus, s"$dir/bm25")

      val mem = MemoryStream[(Long, String)]
      val q = StreamingOps.ingestLoop(mem.toDF.toDF("doc_id", "text"),
        gateDir = None, s"$dir/dedup", s"$dir/substr", s"$dir/bm25",
        s"$dir/decisions")
      try {
        val rows = docs.filter(isBatch).select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1)))
        val (c1, c2) = rows.partition(_._1 < Pipeline.Cycle2Start)
        mem.addData(c1.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(c2.toIndexedSeq: _*); q.processAllAvailable()
      } finally q.stop()

      // batch_id comes back through directory-name partition inference —
      // pin it to long before reading
      val decisions = spark.read.parquet(s"$dir/decisions")
        .withColumn("batch_id", col("batch_id").cast("long"))
        .collect().groupBy(_.getAs[Long]("batch_id"))
        .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
      assert(decisions.keySet == Set(0L, 1L), s"expected 2 micro-batches, got ${decisions.keySet}")
      assert(decisions(0L) == cycle1,
        "micro-batch-1 admission diverges from the pipeline's cycle-1 decision")
      assert(decisions(1L) == cycle2,
        "micro-batch-2 admission diverges from the pipeline's cycle-2 decision — " +
          "the stream's folds did not feed forward like the batch loop's")

      // the folded retrieval index's corpus scalars equal the batch loop's
      def scalars(p: String) = Bm25Index.metaDf(spark, p).collect()(0) match {
        case r => (r.getAs[Long]("n"), r.getAs[Long]("sum_dl"), r.getAs[Long]("n_dl"))
      }
      assert(scalars(s"$dir/bm25") == scalars(s"$pipeRoot/bm25"),
        "streamed BM25 scalar folds diverge from the batch pipeline's")

      // the q_pipeline_maint claim AS A STREAM: compaction between
      // micro-batches (the Tuesday-night window — stream idle, writer
      // lease free) is invisible to the next micro-batch's admission.
      // Each foreachBatch loads the trees fresh, so the swapped roots are
      // picked up; the decisions and folded scalars must be identical.
      val dir2 = java.nio.file.Files.createTempDirectory("graft-ingest-maint").toString
      DedupIndex.write(banded.filter(!isBatch), s"$dir2/dedup")
      SubstringIndex.write(corpus, s"$dir2/substr")
      Bm25Index.write(corpus, s"$dir2/bm25")
      val mem2 = MemoryStream[(Long, String)]
      val q2 = StreamingOps.ingestLoop(mem2.toDF.toDF("doc_id", "text"),
        gateDir = None, s"$dir2/dedup", s"$dir2/substr", s"$dir2/bm25",
        s"$dir2/decisions")
      try {
        val rows = docs.filter(isBatch).select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1)))
        val (c1, c2) = rows.partition(_._1 < Pipeline.Cycle2Start)
        mem2.addData(c1.toIndexedSeq: _*); q2.processAllAvailable()
        DedupIndex.compact(spark, s"$dir2/dedup")
        SubstringIndex.compact(spark, s"$dir2/substr")
        Bm25Index.compact(spark, s"$dir2/bm25")
        mem2.addData(c2.toIndexedSeq: _*); q2.processAllAvailable()
      } finally q2.stop()
      val d2 = spark.read.parquet(s"$dir2/decisions")
        .withColumn("batch_id", col("batch_id").cast("long"))
        .collect().groupBy(_.getAs[Long]("batch_id"))
        .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
      assert(d2(0L) == cycle1 && d2(1L) == cycle2,
        "mid-stream compaction changed an admission decision")
      assert(scalars(s"$dir2/bm25") == scalars(s"$pipeRoot/bm25"),
        "mid-stream compaction corrupted the BM25 scalar folds")
    } finally { banded.unpersist(); () }
  }
}
