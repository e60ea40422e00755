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
    *
    * REPLACE semantics, stated because they bite: this is
    * `createOrReplaceTempView`, so a same-named temp view from any earlier
    * caller is silently superseded — a session that needs two snapshots of
    * different tables live at once must use two names. [[sqlOver]] avoids
    * the hazard entirely: it refuses to shadow a pre-existing relation and
    * drops its own registrations on exit.
    */
  def register(table: KeyedTable, name: String, version: Option[Long] = None): Long = {
    val v = version.getOrElse(table.currentVersion)
    table.atVersion(v).createOrReplaceTempView(name)
    v
  }

  /** Re-capture the newest snapshot under the same name. */
  def refresh(table: KeyedTable, name: String): Long = register(table, name)

  /** Convenience for ad-hoc reads: register-then-query in one call.
    *
    * Leaves NO residue in the session catalog: `spark.sql` analyzes the
    * query EAGERLY (the returned DataFrame's plan references the resolved
    * relations, not the view names), so the temp views are dropped before
    * returning and later SQL in the session cannot be silently redirected
    * by this call's registrations. A binding name that already exists in
    * the catalog is rejected up front — replacing a caller's own view and
    * then DROPPING it on exit would destroy state this method doesn't own.
    */
  def sqlOver(spark: SparkSession, bindings: Map[String, KeyedTable],
              query: String): DataFrame = {
    bindings.keys.foreach { n =>
      require(!spark.catalog.tableExists(n),
        s"sqlOver: relation '$n' already exists in the session catalog — " +
          "binding it would shadow (and on exit destroy) a view this call doesn't own")
    }
    bindings.foreach { case (n, t) => register(t, n) }
    try spark.sql(query)
    finally bindings.keys.foreach(spark.catalog.dropTempView)
  }
}
