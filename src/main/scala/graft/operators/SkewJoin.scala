package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row with the same key to one task; a
  * hot key (the boilerplate document, the anonymous user) turns into
  * one straggler task that dominates the stage. Salting splits each
  * hot key across `numSalts` tasks: the large side gets a
  * deterministic salt in `[0, numSalts)` derived from a unique column
  * (not `rand()` — retries and speculative tasks must produce
  * identical rows), the small side is replicated once per salt value,
  * and the join key becomes `(key, salt)`.
  *
  * AQE's skew-join handles *sort-merge* skew automatically by
  * splitting oversized partitions, so reach for explicit salting when
  * (a) the skew is inside a single key (AQE cannot split one key's
  * rows for a join that must co-locate them) or (b) the join is
  * followed by an aggregation on the same key, where the salt also
  * spreads the partial aggregate. Replication multiplies the small
  * side by `numSalts` — keep `numSalts` ≈ the straggler factor, not
  * hundreds.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key` with `numSalts`-way
    * salting. `bigUnique` must be unique per `big` row (drives the
    * deterministic salt). Output columns: `big.*` then `small.*`
    * minus its join key. */
  def salted(
      big: DataFrame, bigKey: String, bigUnique: Column,
      small: DataFrame, smallKey: String,
      numSalts: Int): DataFrame = {
    // the helper column would silently shadow (and then drop) a real
    // input column of the same name
    require(!(big.columns ++ small.columns).contains("_graft_salt"),
      "inputs may not contain a column named '_graft_salt'")
    val b = big.withColumn("_graft_salt",
      pmod(xxhash64(bigUnique), lit(numSalts.toLong)).cast("int"))
    val sm = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    val joined = b.join(sm,
      b(bigKey) === sm(smallKey) && b("_graft_salt") === sm("_graft_salt"))
    val outCols = big.columns.map(b(_)) ++
      small.columns.filterNot(_ == smallKey).map(sm(_))
    joined.select(outCols.toIndexedSeq: _*)
  }
}
