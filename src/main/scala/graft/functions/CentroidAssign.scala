package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** The ONE centroid argmax scan shared by [[CentroidAssign]] and
  * [[CentroidBest]] — interpreted form and codegen template both live
  * here, so the chunked-parity contract (per-chunk argmax + max-of-maxima
  * ≡ single scan, bit-for-bit) can never be broken by editing one copy's
  * accumulation or tie-break and missing the other. Contract: vnorm
  * computed once per row; cosine = dot/(vnorm·norm_c) accumulated
  * left-to-right; compareDoubles total order (NaN greatest); ties keep
  * the first (smallest-cid) incumbent — centroids scan in ascending-cid
  * order.
  */
private[functions] object CentroidScan {

  def best(v: ArrayData, what: String, cidArr: Array[Long],
           centArr: Array[Array[Double]], normArr: Array[Double]): (Double, Long) = {
    val nv = v.numElements()
    // a mismatched vector would otherwise silently dot only the shared
    // prefix — a quietly wrong cosine, not an error
    if (nv != centArr(0).length) throw new IllegalArgumentException(
      s"$what: vector has $nv elements, centroids have ${centArr(0).length}")
    var vsq = 0.0
    var i = 0
    while (i < nv) { val x = v.getDouble(i); vsq += x * x; i += 1 }
    val vnorm = math.sqrt(vsq)
    var best = 0.0
    var bestCid = 0L
    var first = true
    var c = 0
    while (c < centArr.length) {
      val cv = centArr(c)
      var dot = 0.0
      i = 0
      while (i < nv) { dot += v.getDouble(i) * cv(i); i += 1 }
      val cos = dot / (vnorm * normArr(c))
      if (first || SQLOrderingUtil.compareDoubles(cos, best) > 0) {
        first = false; best = cos; bestCid = cidArr(c)
      }
      c += 1
    }
    (best, bestCid)
  }

  /** Emit the scan as generated Java; returns (code, bestVar, bestCidVar)
    * for the caller to append its emission statement.
    */
  def genBest(ctx: CodegenContext, v: String, what: String,
              cidArr: Array[Long], centArr: Array[Array[Double]],
              normArr: Array[Double]): (String, String, String) = {
    val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", normArr, "double[]")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val nv = ctx.freshName("nv")
    val vsq = ctx.freshName("vsq")
    val vnorm = ctx.freshName("vnorm")
    val dot = ctx.freshName("dot")
    val cos = ctx.freshName("cos")
    val best = ctx.freshName("best")
    val bestCid = ctx.freshName("bestCid")
    val first = ctx.freshName("first")
    val cv = ctx.freshName("cv")
    val x = ctx.freshName("x")
    val code = s"""
       |int $nv = $v.numElements();
       |if ($nv != $centsRef[0].length) {
       |  throw new IllegalArgumentException("$what: vector has " +
       |    $nv + " elements, centroids have " + $centsRef[0].length);
       |}
       |double $vsq = 0.0;
       |for (int $i = 0; $i < $nv; $i++) {
       |  double $x = $v.getDouble($i); $vsq += $x * $x;
       |}
       |double $vnorm = java.lang.Math.sqrt($vsq);
       |double $best = 0.0; long $bestCid = 0L; boolean $first = true;
       |for (int $c = 0; $c < $centsRef.length; $c++) {
       |  double[] $cv = $centsRef[$c];
       |  double $dot = 0.0;
       |  for (int $i = 0; $i < $nv; $i++) { $dot += $v.getDouble($i) * $cv[$i]; }
       |  double $cos = $dot / ($vnorm * $normsRef[$c]);
       |  if ($first || org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($cos, $best) > 0) {
       |    $first = false; $best = $cos; $bestCid = $cidsRef[$c];
       |  }
       |}
     """.stripMargin
    (code, best, bestCid)
  }
}

/** Nearest-centroid assignment as ONE codegen'd expression: for an input
  * vector, returns the id of the cosine-nearest centroid from a fixed
  * centroid set baked in as reference objects (primitive double[][] — no
  * per-row boxing, no array literal materialization, no lambda
  * interpretation).
  *
  * This is the IVF assignment hot loop (SURVEY §2.I3 tier (b): custom
  * Expression before UDF): the projection-only plan shape of
  * `Similarity.ivfAssign` (no join/window/Exchange) is kept, while the
  * per-row work drops from an interpreted higher-order `transform` +
  * `array_max` to a primitive nested loop inside whole-stage codegen.
  *
  * Selection contract (must stay bit-compatible with the struct-max form
  * and the DuckDB oracle's `row_number() OVER (ORDER BY cos DESC, cid)`):
  * cosine = dot(v,c) / (sqrt(dot(v,v)) * norm_c), accumulated
  * left-to-right; doubles compare with Spark's total order
  * (SQLOrderingUtil.compareDoubles — NaN greatest, same as struct
  * ordering); ties on cosine pick the smallest cid (centroids are scanned
  * in ascending-cid order and only a STRICTLY greater cosine replaces the
  * incumbent).
  *
  * Null contract: null input vector → null; centroid set must be
  * non-empty.
  */
case class CentroidAssign(
    child: Expression,
    cids: Seq[Long],
    cents: Seq[IndexedSeq[Double]],
    norms: Seq[Double]) extends UnaryExpression {

  require(cids.nonEmpty && cids.length == cents.length && cids.length == norms.length,
    "CentroidAssign needs a non-empty, aligned centroid set")
  require(cents.forall(_.length == cents.head.length),
    "CentroidAssign needs centroids of uniform dimension")

  // Seq fields give the case class VALUE equality (Array fields compare by
  // reference, which would break semanticEquals / subexpression reuse /
  // cached-plan matching); the primitive views below are what the hot
  // loops index — built once per (de)serialized instance.
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = norms.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_assign needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CentroidScan.best(input.asInstanceOf[ArrayData], "centroid_assign",
      cidArr, centArr, normArr)._2

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val (scan, _, bestCid) =
        CentroidScan.genBest(ctx, v, "centroid_assign", cidArr, centArr, normArr)
      scan + s"\n${ev.value} = $bestCid;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The best (cosine, −cid) of a centroid CHUNK as a struct — the building
  * block of the chunked assignment path for centroid sets too large to
  * scan as one reference object. Struct ordering makes `greatest` over
  * per-chunk bests equal the global (cos DESC, cid ASC) winner: cos
  * compares first (Spark's struct comparison uses the same NaN-greatest
  * total order as SQLOrderingUtil), and on cos ties the larger −cid is
  * the smaller cid — identical to [[CentroidAssign]]'s scan, which keeps
  * the first (smallest-cid) incumbent on ties. Same loop, same
  * accumulation order, so per-chunk argmax + max-of-maxima is
  * bit-identical to the single-chunk form.
  */
case class CentroidBest(
    child: Expression,
    cids: Seq[Long],
    cents: Seq[IndexedSeq[Double]],
    norms: Seq[Double]) extends UnaryExpression {

  require(cids.nonEmpty && cids.length == cents.length && cids.length == norms.length,
    "CentroidBest needs a non-empty, aligned centroid set")
  require(cents.forall(_.length == cents.head.length),
    "CentroidBest needs centroids of uniform dimension")

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = norms.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("ncid", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_best needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val (best, bestCid) = CentroidScan.best(
      input.asInstanceOf[ArrayData], "centroid_best", cidArr, centArr, normArr)
    new GenericInternalRow(Array[Any](best, -bestCid))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val (scan, best, bestCid) =
        CentroidScan.genBest(ctx, v, "centroid_best", cidArr, centArr, normArr)
      scan +
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |  new Object[]{ $best, -$bestCid });
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`n` (cos, −cid) cells for a probe vector as ONE codegen'd
  * expression — the probe-side sibling of [[CentroidAssign]] (IVF cell
  * selection: `Similarity.topCells`). Replaces the interpreted
  * `slice(sort_array(transform(...)), 1, n)` pipeline, whose lambda
  * re-evaluated the probe's own norm `sqrt(dot(v,v))` PER CENTROID
  * (Catalyst does not hoist subexpressions out of higher-order-function
  * lambdas); here the norm is computed once per row and the selection is
  * a primitive partial selection sort.
  *
  * Selection contract (bit-compatible with the struct sort it replaced
  * and the oracle's `ORDER BY cos DESC, cid`): cosine = dot(v,c) /
  * (sqrt(dot(v,v)) * norm_c) accumulated left-to-right; doubles compare
  * with Spark's total order (NaN greatest, matching struct sort_array);
  * ties on cosine order by ascending cid (larger −cid first, exactly the
  * descending struct order). Output: the min(n, C) best cells as
  * `array<struct<cos:double, ncid:bigint>>`, best first.
  *
  * Null contract: null input vector → null (the old form produced an
  * array of null-cos structs; every consumer explodes and equi-joins on
  * the cell id, so both shapes contribute zero candidate rows).
  */
case class CentroidTopCells(
    child: Expression,
    cids: Seq[Long],
    cents: Seq[IndexedSeq[Double]],
    norms: Seq[Double],
    n: Int) extends UnaryExpression {

  require(cids.nonEmpty && cids.length == cents.length && cids.length == norms.length,
    "CentroidTopCells needs a non-empty, aligned centroid set")
  require(cents.forall(_.length == cents.head.length),
    "CentroidTopCells needs centroids of uniform dimension")
  require(n >= 1, s"CentroidTopCells needs n >= 1, got $n")

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = norms.toArray

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("ncid", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_top_cells needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    if (nv != centArr(0).length) throw new IllegalArgumentException(
      s"centroid_top_cells: vector has $nv elements, centroids have ${centArr(0).length}")
    var vsq = 0.0
    var i = 0
    while (i < nv) { val x = v.getDouble(i); vsq += x * x; i += 1 }
    val vnorm = math.sqrt(vsq)
    val cCount = centArr.length
    val cos = new Array[Double](cCount)
    var c = 0
    while (c < cCount) {
      val cv = centArr(c)
      var dot = 0.0
      i = 0
      while (i < nv) { dot += v.getDouble(i) * cv(i); i += 1 }
      cos(c) = dot / (vnorm * normArr(c))
      c += 1
    }
    val outN = math.min(n, cCount)
    val idx = Array.tabulate(cCount)(identity)
    var a = 0
    while (a < outN) {
      var best = a
      var b = a + 1
      while (b < cCount) {
        val cmp = SQLOrderingUtil.compareDoubles(cos(idx(b)), cos(idx(best)))
        if (cmp > 0 || (cmp == 0 && cidArr(idx(b)) < cidArr(idx(best)))) best = b
        b += 1
      }
      val t = idx(a); idx(a) = idx(best); idx(best) = t
      a += 1
    }
    val rows = new Array[Any](outN)
    a = 0
    while (a < outN) {
      rows(a) = new GenericInternalRow(Array[Any](cos(idx(a)), -cidArr(idx(a))))
      a += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
      val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
      val normsRef = ctx.addReferenceObj("norms", normArr, "double[]")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val nv = ctx.freshName("nv")
      val vsq = ctx.freshName("vsq")
      val vnorm = ctx.freshName("vnorm")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val cv = ctx.freshName("cv")
      val x = ctx.freshName("x")
      val outN = ctx.freshName("outN")
      val idx = ctx.freshName("idx")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val best = ctx.freshName("best")
      val cmp = ctx.freshName("cmp")
      val t = ctx.freshName("t")
      val rows = ctx.freshName("rows")
      s"""
         |int $nv = $v.numElements();
         |if ($nv != $centsRef[0].length) {
         |  throw new IllegalArgumentException("centroid_top_cells: vector has " +
         |    $nv + " elements, centroids have " + $centsRef[0].length);
         |}
         |double $vsq = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double $x = $v.getDouble($i); $vsq += $x * $x;
         |}
         |double $vnorm = java.lang.Math.sqrt($vsq);
         |double[] $cos = new double[$centsRef.length];
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $nv; $i++) { $dot += $v.getDouble($i) * $cv[$i]; }
         |  $cos[$c] = $dot / ($vnorm * $normsRef[$c]);
         |}
         |int $outN = $centsRef.length < $n ? $centsRef.length : $n;
         |int[] $idx = new int[$centsRef.length];
         |for (int $c = 0; $c < $centsRef.length; $c++) { $idx[$c] = $c; }
         |for (int $a = 0; $a < $outN; $a++) {
         |  int $best = $a;
         |  for (int $b = $a + 1; $b < $centsRef.length; $b++) {
         |    int $cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(
         |      $cos[$idx[$b]], $cos[$idx[$best]]);
         |    if ($cmp > 0 || ($cmp == 0 && $cidsRef[$idx[$b]] < $cidsRef[$idx[$best]])) {
         |      $best = $b;
         |    }
         |  }
         |  int $t = $idx[$a]; $idx[$a] = $idx[$best]; $idx[$best] = $t;
         |}
         |Object[] $rows = new Object[$outN];
         |for (int $a = 0; $a < $outN; $a++) {
         |  $rows[$a] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $cos[$idx[$a]], -$cidsRef[$idx[$a]] });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidAssign {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.functions.greatest

  /** `centroid_assign(v)` over centroids given as (cid, vector, norm),
    * pre-sorted here by cid to pin the tie-break order. */
  def centroid_assign(v: Column, centroids: Seq[(Long, Seq[Double], Double)]): Column = {
    val sorted = centroids.sortBy(_._1)
    ColumnBridge.column(CentroidAssign(
      ColumnBridge.expression(v),
      sorted.map(_._1),
      sorted.map(_._2.toIndexedSeq),
      sorted.map(_._3)))
  }

  /** `centroid_top_cells(v, n)` over centroids given as (cid, vector,
    * norm), pre-sorted here by cid to pin the tie-break order — the
    * probe-side cell selection ([[CentroidTopCells]]).
    */
  def centroid_top_cells(v: Column, centroids: Seq[(Long, Seq[Double], Double)],
                         n: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    ColumnBridge.column(CentroidTopCells(
      ColumnBridge.expression(v),
      sorted.map(_._1),
      sorted.map(_._2.toIndexedSeq),
      sorted.map(_._3),
      n))
  }

  /** Chunked assignment for centroid sets past what one expression should
    * carry (≈√N grows to 10⁵+ at billion-vector scale): the set is split
    * into `chunkSize` chunks, each scanned by its own [[CentroidBest]],
    * and the global winner is `greatest` over the per-chunk (cos, −cid)
    * structs — still ONE projection, no join/shuffle, and bit-identical
    * to [[centroid_assign]] (pinned by the SimilaritySpec property test).
    */
  def centroid_assign_chunked(v: Column, centroids: Seq[(Long, Seq[Double], Double)],
                              chunkSize: Int): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    val sorted = centroids.sortBy(_._1)
    val chunks = sorted.grouped(chunkSize).toSeq
    if (chunks.lengthCompare(1) <= 0) centroid_assign(v, centroids)
    else {
      val bests = chunks.map { ch =>
        ColumnBridge.column(CentroidBest(
          ColumnBridge.expression(v),
          ch.map(_._1), ch.map(_._2.toIndexedSeq), ch.map(_._3)))
      }
      -greatest(bests: _*).getField("ncid")
    }
  }
}
