package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Deterministic whole-row content hash, shared by the salted join and the
  * keep-first dedup tie-break. xxhash64 rejects MapType (no canonical entry
  * order), so map-bearing columns are excluded — the hash stays a pure,
  * retry-stable function of the remaining row content.
  */
object RowHash {

  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType      => false
    case s: StructType   => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType    => hashable(a.elementType)
    case _               => true
  }

  /** xxhash64 over every hash-safe column; lit(0) when none qualify. */
  def contentHash(df: DataFrame): Column = {
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    if (cols.isEmpty) lit(0L) else xxhash64(cols: _*)
  }
}
