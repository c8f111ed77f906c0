package graft.lakehouse

/** One WHEN-clause of a conditional MERGE, Iceberg-semantics
  * (the engine the reference runs its MERGE INTO against supports
  * `WHEN MATCHED [AND cond] THEN UPDATE SET …/DELETE` and
  * `WHEN NOT MATCHED [AND cond] THEN INSERT …`,
  * producer_iceberg_datalake_setup.sh:203-236 exercises the surface).
  *
  * Conditions and value expressions are SQL over a *flat* namespace:
  * target columns by their own names, source columns prefixed with
  * [[GraftTable.SrcPrefix]] (`_src_`). The SQL front-end
  * ([[LakeSqlRule]]) translates alias-qualified references
  * (`t.c` / `s.c`) into this namespace; library callers write it
  * directly. Clause order is significant: the first clause whose
  * condition holds wins, exactly like SQL MERGE.
  */
sealed trait MergeClause

object MergeClause {
  /** `WHEN MATCHED [AND condition] THEN UPDATE SET …`. An empty `set`
    * means `UPDATE SET *` (every column replaced from the source). */
  final case class Update(condition: Option[String],
      set: Map[String, String]) extends MergeClause

  /** `WHEN MATCHED [AND condition] THEN DELETE`. */
  final case class Delete(condition: Option[String]) extends MergeClause

  /** `WHEN NOT MATCHED [AND condition] THEN INSERT …`. An empty
    * `values` means `INSERT *`; otherwise unassigned columns insert
    * NULL (SQL semantics). Conditions/values may reference source
    * columns only. */
  final case class Insert(condition: Option[String],
      values: Map[String, String]) extends MergeClause

  /** `WHEN NOT MATCHED BY SOURCE [AND condition] THEN UPDATE SET …`
    * (Spark 3.4+ / Delta / Iceberg): applies to TARGET rows with no
    * source match; conditions and values reference target columns
    * only. `set` must be explicit (there is no source row to star
    * from). Copy-on-write only — merge-on-read refuses loudly. */
  final case class UpdateBySource(condition: Option[String],
      set: Map[String, String]) extends MergeClause

  /** `WHEN NOT MATCHED BY SOURCE [AND condition] THEN DELETE`. */
  final case class DeleteBySource(condition: Option[String])
      extends MergeClause
}
