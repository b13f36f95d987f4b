package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-robust equi-join (SURVEY §2.C1 at 100 TB): when one join key is a
  * heavy hitter, a plain shuffle join lands its entire partition on one
  * task. Salting spreads it: the fact side gets a deterministic per-row
  * salt in [0, saltFactor), the (small) dimension side is replicated once
  * per salt value, and the join key becomes (key, salt) — the hot key now
  * occupies saltFactor shuffle partitions. The result set is identical to
  * the unsalted join, which is exactly what the DuckDB oracle of
  * `q_join_skew_salted` pins.
  *
  * AQE's skew-join split handles sort-merge cases adaptively; explicit
  * salting remains the tool when AQE can't help (hash aggregation over the
  * joined key, pre-AQE shuffles, or deterministic plan requirements).
  */
object SkewJoin {

  /** No MapType anywhere in the type tree — the shared invariant behind
    * two operator guards: `hash()` rejects maps at analysis time (map
    * equality is unordered), and sort order is undefined over them, so
    * both the salt-column pick here and AsofJoin's payload-ordering check
    * need the same recursive walk.
    */
  private[operators] def mapFree(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => s.fields.forall(f => mapFree(f.dataType))
      case a: ArrayType  => mapFree(a.elementType)
      case _: MapType    => false
      case _             => true
    }
  }

  /** Inner equi-join of `fact` with `dim` on `keys`, fact side salted,
    * dim side replicated `saltFactor`×. Equivalent to
    * `fact.join(dim, keys)` for any saltFactor >= 1.
    */
  def salted(fact: DataFrame, dim: DataFrame, keys: Seq[String], saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    // fail fast instead of silently clobbering (and then dropping) a user
    // column — same reserved-name contract as BandJoin's __band
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "salted reserves column name __salt; rename it on the input")
    // per-row content hash — deterministic, spreads a hot KEY because its
    // rows differ in the other columns. Map-bearing columns are excluded:
    // hash() rejects MapType at analysis time (map equality is unordered),
    // and a fact table with an attrs map would otherwise fail salted where
    // the plain join works. If ONLY map columns exist beyond the keys the
    // salt degenerates to per-key (no spread) — the documented limit.
    val saltCols = fact.schema.fields.filter(f => mapFree(f.dataType)).map(f => col(f.name)).toSeq
    val saltedFact = fact.withColumn("__salt",
      pmod(hash((if (saltCols.nonEmpty) saltCols else keys.map(col)): _*), lit(saltFactor)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedFact.join(replicatedDim, keys :+ "__salt").drop("__salt")
  }
}
