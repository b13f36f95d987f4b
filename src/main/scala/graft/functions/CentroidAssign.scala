package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
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
      val n = math.min(nv, cv.length)
      var dot = 0.0
      i = 0
      while (i < n) { dot += v.getDouble(i) * cv(i); i += 1 }
      val cos = dot / (vnorm * normArr(c))
      if (first || SQLOrderingUtil.compareDoubles(cos, best) > 0) {
        first = false; best = cos; bestCid = cidArr(c)
      }
      c += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
      val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
      val normsRef = ctx.addReferenceObj("norms", normArr, "double[]")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val nv = ctx.freshName("nv")
      val n = ctx.freshName("n")
      val vsq = ctx.freshName("vsq")
      val vnorm = ctx.freshName("vnorm")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val first = ctx.freshName("first")
      val cv = ctx.freshName("cv")
      val x = ctx.freshName("x")
      s"""
         |int $nv = $v.numElements();
         |double $vsq = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double $x = $v.getDouble($i); $vsq += $x * $x;
         |}
         |double $vnorm = java.lang.Math.sqrt($vsq);
         |double $best = 0.0; long $bestCid = 0L; boolean $first = true;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($nv, $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $dot += $v.getDouble($i) * $cv[$i]; }
         |  double $cos = $dot / ($vnorm * $normsRef[$c]);
         |  if ($first || org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($cos, $best) > 0) {
         |    $first = false; $best = $cos; $bestCid = $cidsRef[$c];
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidAssign {
  import org.apache.spark.sql.graftbridge.ColumnBridge

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
}
