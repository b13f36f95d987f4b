package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diffing (SURVEY §2.G2's stated use case): the atomic-swap
  * snapshot model makes "what changed since the last run" a natural
  * first-class query — added / removed / changed / unchanged per key
  * between two snapshots of the same table.
  *
  * One full-outer shuffle join on the key set; non-key columns compared
  * null-safely (`<=>`, SQL IS NOT DISTINCT FROM). No hashing of row
  * content — column-wise comparison keeps the semantics engine-portable
  * (and DuckDB-oracle-checkable) and lets Catalyst prune compared columns.
  */
object SnapshotDiff {

  /** PRECONDITION: `keys` uniquely identifies a row within each snapshot
    * (the snapshot model's primary key). Duplicate keys are NOT detected
    * — enforcing uniqueness would cost a full aggregation pass per call —
    * and make the full-outer join emit a per-key cross product with mixed
    * statuses instead of one row.
    *
    * @return one row per key present in either snapshot:
    *         (keys…, status ∈ added|removed|changed|unchanged)
    */
  def diff(prev: DataFrame, curr: DataFrame, keys: Seq[String]): DataFrame = {
    require(prev.columns.sameElements(curr.columns),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs ${curr.columns.mkString(",")}")
    val nonKey = prev.columns.filterNot(keys.contains).toSeq
    val p = prev.select(keys.map(k => col(k).as(s"__pk_$k")) ++
      nonKey.map(c => col(c).as(s"__p_$c")) :+ lit(1).as("__pe"): _*)
    val c = curr.select(keys.map(k => col(k).as(s"__ck_$k")) ++
      nonKey.map(c0 => col(c0).as(s"__c_$c0")) :+ lit(1).as("__ce"): _*)
    // null-safe key join: a NULL key row present in both snapshots is ONE
    // logical row (unchanged/changed), not an added+removed pair. `<=>`
    // stays an equi-join key, so this still plans as a hash/sort-merge join.
    val joinCond = keys.map(k => col(s"__pk_$k") <=> col(s"__ck_$k")).reduce(_ && _)
    val same =
      if (nonKey.isEmpty) lit(true)
      else nonKey.map(c0 => col(s"__p_$c0") <=> col(s"__c_$c0")).reduce(_ && _)
    p.join(c, joinCond, "full_outer")
      .select(keys.map(k => coalesce(col(s"__pk_$k"), col(s"__ck_$k")).as(k)) :+
        when(col("__pe").isNull, "added")
          .when(col("__ce").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("status"): _*)
  }
}
