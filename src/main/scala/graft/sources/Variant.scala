package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}

/** Shredded VARIANT storage (Iceberg v3's variant type / Delta's
  * shredding; Spark 4's VariantType is the in-memory form of the same
  * idea): a semi-structured JSON column lands as TWO physical
  * columns —
  *
  *  - `typed`: the commonly-queried paths as a plain parquet STRUCT,
  *    so they scan at columnar speed with min/max stats, NESTED
  *    predicate pushdown, and nested-schema pruning — a filter on a
  *    shredded path reaches `PushedFilters` like any native column
  *    and never parses a byte of JSON;
  *  - `residual`: every remaining top-level key as a JSON string,
  *    parsed on demand by the rare queries that need the long tail.
  *
  * At 100 TB this is the difference between "event props are
  * queryable" and "every props predicate is a full-corpus JSON
  * parse": the hot paths cost what typed columns cost, and schema
  * drift in the tail never breaks ingest (new keys land in the
  * residual untouched).
  *
  * The shredding rule is the open-source spec's leaf rule collapsed
  * one level: a TOP-LEVEL key is either fully shredded (all its
  * subpaths typed — structs allowed) or fully residual. Residual
  * values re-render through a string map, so non-string scalars come
  * back quoted — the fidelity a binary variant encoding would keep;
  * the text residual is what keeps this SQL-replayable end to end.
  */
object Variant {

  /** Split `jsonCol` into (typed struct of `shredSchema`, residual
    * JSON holding the top-level keys the schema does not claim).
    * Null/unparseable input shreds to (null struct, null residual) —
    * fail-null like `from_json`, never fail-job. */
  def shred(jsonCol: Column, shredSchema: StructType): (Column, Column) = {
    val typed = from_json(jsonCol, shredSchema)
    val keys = shredSchema.fieldNames.toSeq
    val residual = to_json(map_filter(
      from_json(jsonCol, MapType(StringType, StringType)),
      (k, _) => !k.isin(keys: _*)))
    (typed, residual)
  }

  /** Path access over a shredded pair: a path whose head is shredded
    * reads the typed struct (columnar, pushdown-capable); anything
    * else falls back to a JSON probe of the residual. Returns a
    * string for residual paths (the text residual's type); typed
    * paths keep their schema type. */
  def variantGet(typedCol: Column, residualCol: Column,
      shredSchema: StructType, path: String): Column = {
    val head = path.takeWhile(_ != '.')
    if (shredSchema.fieldNames.contains(head))
      path.split('.').foldLeft(typedCol)(_.getField(_))
    else {
      // the residual re-renders nested objects as QUOTED JSON strings
      // (the map<string,string> round-trip), so a single dotted probe
      // would silently return null for data that exists — extract the
      // head's string value first, then probe INTO it
      val rest = path.drop(head.length + 1)
      val headVal = get_json_object(residualCol, "$." + head)
      if (rest.isEmpty) headVal
      else get_json_object(headVal, "$." + rest)
    }
  }
}
