package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface over the engine's stored tables — the reference's warehouse
  * tables are SQL-visible (`synapse_table_creation.sql` DDL + ad-hoc
  * verification queries, `README.md:269-273`); this registers a
  * [[KeyedTable]]'s snapshot in the session catalog so `spark.sql` reads
  * it like any other relation.
  *
  * Version semantics are deliberate: a registration captures the table's
  * CURRENT manifest at registration time, so every SQL statement against
  * the name sees ONE consistent snapshot no matter how many maintenance
  * commits land while a report runs — the same snapshot isolation
  * [[KeyedTable.current]] gives a single frame, extended to a whole SQL
  * session. Call [[refresh]] (or re-register) to advance to the newest
  * version; pass `version` to pin time travel into SQL.
  */
object Catalog {

  /** Register `table` (current or a pinned version) as temp view `name`.
    * Returns the registered version.
    */
  def register(table: KeyedTable, name: String, version: Option[Long] = None): Long = {
    val v = version.getOrElse(table.currentVersion)
    table.atVersion(v).createOrReplaceTempView(name)
    v
  }

  /** Re-capture the newest snapshot under the same name. */
  def refresh(table: KeyedTable, name: String): Long = register(table, name)

  /** Convenience for ad-hoc reads: register-then-query in one call. */
  def sqlOver(spark: SparkSession, bindings: Map[String, KeyedTable],
              query: String): DataFrame = {
    bindings.foreach { case (n, t) => register(t, n) }
    spark.sql(query)
  }
}
