package graft.fgac

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lakehouse.{GraftTable, MergeClause}

/** FGAC on the lakehouse *write path*: wraps a [[GraftTable]] behind
  * its governed name so every DML call is authorized against the
  * session principal's write grant ([[SecureCatalog.authorizeWrite]])
  * and every read comes back policy-filtered — the composition the
  * reference runs, where Lake Formation grants SELECT and
  * INSERT/DELETE separately on the producer's Iceberg tables
  * (producer_iceberg_datalake_setup.sh:215-262,
  * consumer_emr_on_eks_setup.sh:294-335). Without this, any principal
  * holding a filtered SELECT grant could mutate rows it cannot even
  * see.
  */
final class GovernedGraftTable(
    val underlying: GraftTable,
    val tableName: String,
    spark: SparkSession) {

  private def principal: String =
    spark.conf.get(SecureCatalog.PrincipalConf, "")

  private def checkWrite(op: String): Unit =
    SecureCatalog.authorizeWrite(principal, tableName, op)

  /** Policy-filtered view of the current snapshot (read grants). */
  def read(): DataFrame = secured(underlying.read())

  /** Stats-pruned read — same read-policy enforcement as [[read]]:
    * file skipping only shrinks the scan, the policy still applies. */
  def readWhere(filterSql: String): DataFrame =
    secured(underlying.readWhere(filterSql))

  private def secured(raw: DataFrame): DataFrame =
    if (principal.isEmpty) raw
    else SecureCatalog.authorize(principal, tableName)
      .map(Enforcer.secure(raw, _, principal)).getOrElse(raw)

  def append(df: DataFrame): Long = { checkWrite("INSERT"); underlying.append(df) }
  def overwrite(df: DataFrame): Long = { checkWrite("OVERWRITE"); underlying.overwrite(df) }
  def delete(predSql: String): Long = { checkWrite("DELETE"); underlying.delete(predSql) }
  /** Merge-on-read DELETE is still a DELETE for authorization. */
  def deleteMoR(predSql: String): Long = {
    checkWrite("DELETE"); underlying.deleteMoR(predSql)
  }
  def update(assignments: Map[String, String], predSql: String): Long = {
    checkWrite("UPDATE"); underlying.update(assignments, predSql)
  }
  def merge(source: DataFrame, key: String): Long = {
    checkWrite("MERGE"); underlying.merge(source, key)
  }
  def merge(source: DataFrame, keys: Seq[String], clauses: Seq[MergeClause]): Long = {
    checkWrite("MERGE"); underlying.merge(source, keys, clauses)
  }

  // schema evolution and maintenance are writes too: reshaping or
  // rewriting a table a principal can only SELECT from is denied
  def addColumns(cols: Seq[org.apache.spark.sql.types.StructField]): Long = {
    checkWrite("ALTER"); underlying.addColumns(cols)
  }
  def dropColumn(name: String): Long = {
    checkWrite("ALTER"); underlying.dropColumn(name)
  }
  def renameColumn(from: String, to: String): Long = {
    checkWrite("ALTER"); underlying.renameColumn(from, to)
  }
  def compact(numFiles: Int, sortBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil): Long = {
    checkWrite("OPTIMIZE"); underlying.compact(numFiles, sortBy, zorderBy)
  }
  def expireSnapshots(keepLast: Int): Unit = {
    checkWrite("VACUUM"); underlying.expireSnapshots(keepLast)
  }
}
