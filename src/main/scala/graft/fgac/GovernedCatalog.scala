package graft.fgac

import java.util

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin backing the governed namespaces.
  *
  * The reference addresses every governed table through a configured
  * catalog — `spark.sql.catalog.dev` pointing at Glue/Lake Formation
  * (consumer_emr_on_eks_setup.sh:438-447) — so qualified names like
  * `dev.healthcare_db.rl_patients` resolve *through the catalog*, and
  * the secure engine injects policy during resolution. This plugin is
  * that wiring in local mode: it claims the catalog name (so the
  * analyzer routes `gov.db.t` here instead of erroring on
  * spark_catalog's single-part-namespace rule) and reports every
  * table as not-found, which leaves the relation unresolved for
  * [[FgacRule]] to rewrite into the policy-secured plan in the same
  * resolution batch. Identification stays with the catalog; data
  * access and policy stay with the rule — the same split as Lake
  * Formation (catalog in Glue, credentials vended per-policy).
  */
class GovernedCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  /** Always defers: the analyzer treats NoSuchTableException as
    * "leave unresolved", which hands the name to [[FgacRule]]. */
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"governed catalog '$catalogName' is read-only; use GraftTable for DML")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"governed catalog '$catalogName' is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"governed catalog '$catalogName' is read-only")
}
