package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization encoder as ONE codegen'd expression: the input
  * vector is split into M contiguous subspaces; each subspace is assigned
  * its L2-nearest codeword (of K per subspace) from a codebook baked in
  * as a reference object, and the M code indices are packed into a single
  * long, 4 bits per code (K ≤ 16) — the 64-dim float vector compresses to
  * 8 bytes, the representation a PQ/ADC index scans instead of raw
  * embeddings.
  *
  * Parity contract (pinned by the q_embed_pq* oracles): per-subspace
  * distance is Σ (x−c)·(x−c) accumulated left-to-right — the identical
  * IEEE sequence DuckDB's `list_reduce` fold performs — and only a
  * STRICTLY smaller distance replaces the incumbent while codewords scan
  * in ascending-k order, so ties pick the smallest k (`ORDER BY d2, k`).
  *
  * Null contract: null vector → null; the codebook must be non-empty and
  * rectangular (same K per subspace, K ≤ 16). The vector must cover every
  * subspace this expression scores — numElements ≥ (mOffset+M)·subDim,
  * and EXACTLY that under `exact` — a shorter vector is an error, and so
  * is a longer one where exactness applies (it would silently encode a
  * prefix). In the chunked composition only the LAST chunk is exact (its
  * bound is the full M·subDim), so total coverage and total length are
  * both enforced.
  */
case class PqEncode(
    child: Expression,
    codebook: Seq[Seq[IndexedSeq[Double]]], // (m)(k)(j) — subspaces mOffset until mOffset+len
    subDim: Int,
    mOffset: Int = 0,
    // exact: the vector must have EXACTLY (mOffset+M)·subDim elements — a
    // longer one silently encodes a prefix and drops trailing dims (the
    // same wrong-but-valid-looking class as a short vector). True for the
    // plain route and for the LAST chunk of a chunked composition (whose
    // bound is the full M·subDim); non-last chunks legitimately see the
    // longer full vector and only lower-bound it.
    exact: Boolean = true) extends UnaryExpression {

  // subDim <= 0 would make the coverage check below vacuous and encode
  // every subspace to code 0 — a valid-looking packed long of garbage
  // (the SQL route's .intValue can also silently truncate an oversized
  // long literal to exactly such a value)
  require(subDim > 0, s"subDim must be > 0, got $subDim")
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty), "empty codebook")
  require(codebook.forall(_.length == codebook.head.length), "ragged codebook")
  require(codebook.head.length <= 16, "K must be <= 16 (4-bit codes)")
  // every codeword must span EXACTLY subDim dims: shorter would AIOOBE
  // deep in an executor loop, longer would silently score a prefix —
  // a wrong distance with no error (input contract, checked here)
  require(codebook.forall(_.forall(_.length == subDim)),
    s"codeword length must equal subDim=$subDim")
  require(mOffset >= 0 && (mOffset + codebook.length) * 4 <= 64,
    "too many subspaces to pack")

  // Seq fields give VALUE equality (semanticEquals / cached-plan reuse);
  // the primitive view is what the hot loop indexes.
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    val bound = (mOffset + cbArr.length) * subDim
    if (if (exact) nv != bound else nv < bound) throw new IllegalArgumentException(
      s"pq_encode: vector has $nv elements, needs ${if (exact) "exactly" else "at least"} " +
        s"$bound to cover subspaces " +
        s"[$mOffset, ${mOffset + cbArr.length}) x subDim=$subDim")
    var packed = 0L
    var m = 0
    while (m < cbArr.length) {
      val ks = cbArr(m)
      val off = (mOffset + m) * subDim
      var bestK = 0
      var bestD = Double.NaN
      var k = 0
      while (k < ks.length) {
        val cw = ks(k)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val t = v.getDouble(off + j) - cw(j); d += t * t; j += 1
        }
        // compareDoubles: NaN orders GREATEST like the oracle's ORDER BY
        // (a NaN distance from Inf-Inf must lose to any later finite one —
        // a plain `<` would keep the k=0 NaN forever)
        if (k == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(d, bestD) < 0) { bestD = d; bestK = k }
        k += 1
      }
      packed |= bestK.toLong << (4 * (mOffset + m))
      m += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("cb", cbArr, "double[][][]")
      val sd = ctx.freshName("sd")
      val nv = ctx.freshName("nv")
      val packed = ctx.freshName("packed")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val ks = ctx.freshName("ks")
      val cw = ctx.freshName("cw")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestK = ctx.freshName("bestK")
      val bestD = ctx.freshName("bestD")
      s"""
         |final int $sd = $subDim;
         |int $nv = $v.numElements();
         |if (${if (exact) s"$nv != ($mOffset + $cbRef.length) * $sd"
               else s"$nv < ($mOffset + $cbRef.length) * $sd"}) {
         |  throw new IllegalArgumentException("pq_encode: vector has " + $nv +
         |    " elements, needs ${if (exact) "exactly" else "at least"} " +
         |    (($mOffset + $cbRef.length) * $sd));
         |}
         |long $packed = 0L;
         |for (int $m = 0; $m < $cbRef.length; $m++) {
         |  double[][] $ks = $cbRef[$m];
         |  int $off = ($mOffset + $m) * $sd;
         |  int $bestK = 0; double $bestD = Double.NaN;
         |  for (int $k = 0; $k < $ks.length; $k++) {
         |    double[] $cw = $ks[$k];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      double $t = $v.getDouble($off + $j) - $cw[$j]; $d += $t * $t;
         |    }
         |    if ($k == 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($d, $bestD) < 0) { $bestD = $d; $bestK = $k; }
         |  }
         |  $packed |= ((long) $bestK) << (4 * ($mOffset + $m));
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `pq_encode(v)` against codebook(m)(k) = the k-th codeword of
    * subspace m, each of length `subDim`. */
  def pq_encode(v: Column, codebook: Seq[Seq[Seq[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(v),
      codebook.map(_.map(_.toIndexedSeq)),
      subDim))

  /** Chunked encoder for codebooks past what one expression should carry:
    * subspaces are split into groups of `mChunk`, each group encodes its
    * own bit range (the `mOffset` shift), and the packed results combine
    * with bitwise OR — disjoint bits, so the composition is bit-identical
    * to [[pq_encode]] (pinned by the SimilaritySpec property test). Still
    * ONE projection, no join/shuffle.
    */
  def pq_encode_chunked(v: Column, codebook: Seq[Seq[Seq[Double]]], subDim: Int,
                        mChunk: Int): Column = {
    require(mChunk > 0, "mChunk must be positive")
    val groups = codebook.zipWithIndex.grouped(mChunk).toSeq
    if (groups.lengthCompare(1) <= 0) pq_encode(v, codebook, subDim)
    else groups.zipWithIndex.map { case (g, gi) =>
      ColumnBridge.column(PqEncode(
        ColumnBridge.expression(v),
        g.map(_._1.map(_.toIndexedSeq)),
        subDim,
        mOffset = g.head._2,
        // only the LAST chunk's bound is the full M·subDim — its exact
        // check enforces total coverage for the whole composition
        exact = gi == groups.length - 1)): Column
    }.reduce(_.bitwiseOR(_))
  }
}
