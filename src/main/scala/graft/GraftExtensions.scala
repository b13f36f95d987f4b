package graft

import graft.functions.{CentroidAssign, DotProduct, PqAdc, PqEncode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, FunctionIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: surfaces graft's custom Catalyst
  * expressions in SQL so `spark.sql("SELECT dot_product(a, b) …")` works
  * next to the DataFrame API — the documented injection route for engine
  * extensions (no session-state hacking).
  *
  * The ANN kernels carry their trained artifacts (centroids/codebook) as
  * reference objects; their SQL forms take those as LITERAL arguments —
  * resolved once at plan time ([[GraftExtensions.foldedScala]]), so the
  * per-row execution is the identical codegen'd primitive loop as the
  * DataFrame API, never a per-row literal walk.
  *
  * Activate with `--conf spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{centroidsShape, codebookShape, exactPositiveInt, foldedScala, intShape}

  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))

    // pq_encode(v, codebook, sub_dim): codebook = array(array(array(double)))
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "pq_encode(v, codebook, sub_dim)")
        val cb = foldedScala(children(1), "codebook", codebookShape,
            "array<array<array<double>>>").asInstanceOf[Seq[Seq[Seq[Double]]]]
        val sd = exactPositiveInt(
          foldedScala(children(2), "sub_dim", intShape, "int"), "sub_dim")
        PqEncode(children.head, cb.map(_.map(_.toIndexedSeq)), sd)
      }))

    // pq_adc(qv, code, codebook, sub_dim)
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (children: Seq[Expression]) => {
        require(children.size == 4, "pq_adc(qv, code, codebook, sub_dim)")
        val cb = foldedScala(children(2), "codebook", codebookShape,
            "array<array<array<double>>>").asInstanceOf[Seq[Seq[Seq[Double]]]]
        val sd = exactPositiveInt(
          foldedScala(children(3), "sub_dim", intShape, "int"), "sub_dim")
        PqAdc(children.head, children(1), cb.map(_.map(_.toIndexedSeq)), sd)
      }))

    // centroid_assign(v, cents): cents = array(struct(cid bigint,
    // vec array(double), norm double)) — named_struct or struct() both fine
    ext.injectFunction((
      new FunctionIdentifier("centroid_assign"),
      new ExpressionInfo(classOf[CentroidAssign].getName, "centroid_assign"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "centroid_assign(v, centroids)")
        val cents = foldedScala(children(1), "centroids", centroidsShape,
            "array<struct<bigint, array<double>, double>>")
          .asInstanceOf[Seq[org.apache.spark.sql.Row]]
          .map { r =>
            (r.getAs[Number](0).longValue,
             r.getAs[Seq[Double]](1),
             r.getAs[Number](2).doubleValue)
          }
        val sorted = cents.sortBy(_._1)
        CentroidAssign(children.head, sorted.map(_._1),
          sorted.map(_._2.toIndexedSeq), sorted.map(_._3))
      }))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.types._

  /** Evaluate a foldable argument at resolution time and convert it to
    * plain Scala structures (the trained-artifact arguments of the ANN
    * kernels must be constants, not per-row expressions). The declared
    * type is checked BEFORE the unchecked casts at the call sites, so a
    * wrong-typed literal (an integer codebook, a malformed centroid
    * struct) fails with the argument name instead of a downstream
    * ClassCastException from executor code.
    */
  private[graft] def foldedScala(e: Expression, what: String,
                                 shape: DataType => Boolean,
                                 expectedDesc: String): Any = {
    require(e.foldable, s"$what must be a literal (constant-foldable) expression")
    require(shape(e.dataType),
      s"$what must have type $expectedDesc, got ${e.dataType.simpleString}")
    val v = CatalystTypeConverters.convertToScala(e.eval(), e.dataType)
    requireNoNulls(v, what)
    v
  }

  /** The type check above passes nullable array/struct elements, so a
    * literal like `array(struct(1L, array(1.0d, NULL), 1.0d))` would
    * survive it and die later with an unboxing NPE inside plan
    * construction. Walk the converted value and fail here, with the
    * argument name, instead.
    */
  private def requireNoNulls(v: Any, what: String): Unit = v match {
    case null =>
      throw new IllegalArgumentException(
        s"$what must not contain nulls (null element found in literal)")
    case s: Seq[_] => s.foreach(requireNoNulls(_, what))
    case r: org.apache.spark.sql.Row =>
      r.toSeq.foreach(requireNoNulls(_, what))
    case _ => ()
  }

  private[graft] val codebookShape: DataType => Boolean = {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }
  // struct field NAMES are free (struct() or named_struct both work);
  // only the (bigint, array<double>, double) shape is required
  private[graft] val centroidsShape: DataType => Boolean = {
    case ArrayType(StructType(fs), _) if fs.length == 3 =>
      fs(0).dataType == LongType &&
        (fs(1).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) &&
        fs(2).dataType == DoubleType
    case _ => false
  }
  private[graft] val intShape: DataType => Boolean = {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Narrow a foldable integral argument to a positive Int. A plain
    * `.intValue` on an oversized long literal (e.g. `4294967296L`) would
    * silently truncate to 0 and produce a degenerate kernel geometry;
    * fail with the argument name instead.
    */
  private[graft] def exactPositiveInt(v: Any, what: String): Int = {
    val l = v.asInstanceOf[Number].longValue
    require(l > 0 && l <= Int.MaxValue,
      s"$what must be a positive 32-bit int, got $l")
    l.toInt
  }

  /** Install on an already-running session (the builder conf only applies
    * at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ExtensionsBridge.install(ext, spark)
  }
}
