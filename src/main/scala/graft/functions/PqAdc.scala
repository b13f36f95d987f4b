package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Asymmetric (ADC) PQ distance as ONE codegen'd expression: the exact L2²
  * distance between a raw query vector and a candidate represented only by
  * its packed PQ code — Σ_m Σ_j (q[m·sd+j] − cb[m][kₘ][j])² where kₘ is the
  * 4-bit code of subspace m. This is the scoring kernel of an IVF-PQ scan:
  * per (probe, candidate) row it reads 8 bytes of candidate data plus the
  * broadcast codebook, no raw corpus vectors.
  *
  * Replaces the explode(m)+codebook-join+decimal-sum ADC shape: one
  * projection per candidate row instead of M rows through an extra join and
  * a groupBy — no second shuffle, and no decimal workaround because the
  * accumulation order is FIXED (per-subspace inner fold, then an outer
  * left-to-right fold over subspaces — the identical IEEE sequence DuckDB's
  * nested `list_reduce(list_transform(range(M), m -> list_reduce(...)))`
  * performs), so rankings are bit-identical across engines without
  * order-independence tricks.
  *
  * Null contract: null if either input is null; the codebook must be
  * non-empty, rectangular, K ≤ 16 (4-bit codes). The query vector must
  * have exactly M·subDim elements — a shorter vector is an error, not a
  * truncated (silently wrong) distance.
  */
case class PqAdc(
    left: Expression,  // query vector: array<double>
    right: Expression, // packed PQ code: long
    codebook: Seq[Seq[IndexedSeq[Double]]], // (m)(k)(j)
    subDim: Int) extends BinaryExpression {

  require(subDim > 0, s"subDim must be > 0, got $subDim")
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty), "empty codebook")
  require(codebook.forall(_.length == codebook.head.length), "ragged codebook")
  require(codebook.head.length <= 16, "K must be <= 16 (4-bit codes)")
  // every codeword must span EXACTLY subDim dims (see PqEncode) — shorter
  // AIOOBEs in the executor, longer silently scores a prefix
  require(codebook.forall(_.forall(_.length == subDim)),
    s"codeword length must equal subDim=$subDim")
  require(codebook.length * 4 <= 64, "too many subspaces to unpack")

  // Seq fields give VALUE equality (semanticEquals / cached-plan reuse);
  // the primitive view is what the hot loop indexes.
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<double>, bigint), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(q: Any, code: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val c = code.asInstanceOf[Long]
    // a short query vector would otherwise silently score only the
    // subspaces it covers — wrong distance, not an error
    if (v.numElements() != cbArr.length * subDim) throw new IllegalArgumentException(
      s"pq_adc: query vector has ${v.numElements()} elements, expected " +
        s"${cbArr.length * subDim} (M=${cbArr.length} x subDim=$subDim)")
    // bits above 4·M can't come from pq_encode — a code carrying them is
    // malformed input, same contract as the per-subspace check below
    if (cbArr.length * 4 < 64 && (c >>> (4 * cbArr.length)) != 0L)
      throw new IllegalArgumentException(
        s"pq_adc: code has set bits above 4*M=${4 * cbArr.length} " +
          s"(not a pq_encode output): $c")
    var total = 0.0
    var m = 0
    while (m < cbArr.length) {
      val kk = ((c >>> (4 * m)) & 15L).toInt
      // codes are user-suppliable via the SQL surface — fail with the
      // input contract, not an executor AIOOBE
      if (kk >= cbArr(m).length) throw new IllegalArgumentException(
        s"pq_adc: subspace $m code $kk exceeds codebook size ${cbArr(m).length}")
      val cw = cbArr(m)(kk)
      val off = m * subDim
      var d = 0.0
      var j = 0
      while (j < subDim) { val t = v.getDouble(off + j) - cw(j); d += t * t; j += 1 }
      total += d
      m += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val cbRef = ctx.addReferenceObj("cb", cbArr, "double[][][]")
      val sd = ctx.freshName("sd")
      val nv = ctx.freshName("nv")
      val total = ctx.freshName("total")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val cw = ctx.freshName("cw")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |final int $sd = $subDim;
         |int $nv = $v.numElements();
         |if ($nv != $cbRef.length * $sd) {
         |  throw new IllegalArgumentException("pq_adc: query vector has " + $nv +
         |    " elements, expected " + ($cbRef.length * $sd));
         |}
         |if ($cbRef.length * 4 < 64 && ($c >>> (4 * $cbRef.length)) != 0L) {
         |  throw new IllegalArgumentException("pq_adc: code has set bits above 4*M=" +
         |    (4 * $cbRef.length) + " (not a pq_encode output): " + $c);
         |}
         |double $total = 0.0;
         |for (int $m = 0; $m < $cbRef.length; $m++) {
         |  int ${m}_k = (int) (($c >>> (4 * $m)) & 15L);
         |  if (${m}_k >= $cbRef[$m].length) {
         |    throw new IllegalArgumentException("pq_adc: subspace " + $m +
         |      " code " + ${m}_k + " exceeds codebook size " + $cbRef[$m].length);
         |  }
         |  double[] $cw = $cbRef[$m][${m}_k];
         |  int $off = $m * $sd;
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $sd; $j++) {
         |    double $t = $v.getDouble($off + $j) - $cw[$j]; $d += $t * $t;
         |  }
         |  $total += $d;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `pq_adc(qv, code)` against codebook(m)(k), subvectors of length
    * `subDim`. */
  def pq_adc(qv: Column, code: Column, codebook: Seq[Seq[Seq[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(qv), ColumnBridge.expression(code),
      codebook.map(_.map(_.toIndexedSeq)), subDim))
}
