package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {

  test("registration captures ONE snapshot; refresh advances; version pins") {
    val s = spark
    import s.implicits._
    val t = KeyedTable(spark, tmpDir("catalog1"), Seq("k"))
    t.overwrite(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    val v1 = Catalog.register(t, "cat_spec_t")
    assert(v1 == t.currentVersion)
    assert(spark.sql("SELECT sum(v) FROM cat_spec_t").head().getLong(0) == 3L)

    // maintenance lands AFTER registration: the view must keep reading the
    // registered snapshot (a report never straddles a commit)
    t.merge(Seq(("a", 100)).toDF("k", "v"))
    assert(spark.sql("SELECT sum(v) FROM cat_spec_t").head().getLong(0) == 3L)

    // refresh re-captures the newest version
    Catalog.refresh(t, "cat_spec_t")
    assert(spark.sql("SELECT sum(v) FROM cat_spec_t").head().getLong(0) == 102L)

    // explicit version pin = time travel into SQL
    Catalog.register(t, "cat_spec_t_v1", version = Some(v1))
    assert(spark.sql("SELECT v FROM cat_spec_t_v1 WHERE k = 'a'").head().getInt(0) == 1)
    spark.catalog.dropTempView("cat_spec_t")
    spark.catalog.dropTempView("cat_spec_t_v1")
  }

  test("sqlOver binds several tables for one ad-hoc statement") {
    val s = spark
    import s.implicits._
    val a = KeyedTable(spark, tmpDir("catalog2a"), Seq("k"))
    a.overwrite(Seq(("x", 10L), ("y", 20L)).toDF("k", "n"))
    val b = KeyedTable(spark, tmpDir("catalog2b"), Seq("k"))
    b.overwrite(Seq(("x", "first"), ("y", "second")).toDF("k", "label"))
    val res = Catalog.sqlOver(spark, Map("ca" -> a, "cb" -> b),
      "SELECT ca.k, n, label FROM ca JOIN cb ON ca.k = cb.k ORDER BY n")
    // no catalog residue: the views are gone BEFORE any action runs —
    // spark.sql analyzed eagerly, so the plan survives the drop...
    assert(!spark.catalog.tableExists("ca") && !spark.catalog.tableExists("cb"))
    // ...and the result still computes from the captured snapshots
    val out = res.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("x", 10L, "first"), ("y", 20L, "second")))
  }

  test("sqlOver refuses to shadow a relation it doesn't own") {
    val s = spark
    import s.implicits._
    val a = KeyedTable(spark, tmpDir("catalog3"), Seq("k"))
    a.overwrite(Seq(("x", 1L)).toDF("k", "n"))
    // a caller-owned view of the binding's name: replace-then-drop would
    // silently destroy it, so the call must fail up front instead
    Seq(("pre", 9L)).toDF("k", "n").createOrReplaceTempView("cat_owned")
    intercept[IllegalArgumentException] {
      Catalog.sqlOver(spark, Map("cat_owned" -> a), "SELECT * FROM cat_owned")
    }
    // the pre-existing view is untouched
    assert(spark.sql("SELECT n FROM cat_owned").head().getLong(0) == 9L)
    spark.catalog.dropTempView("cat_owned")
  }
}
