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
    val out = Catalog.sqlOver(spark, Map("ca" -> a, "cb" -> b),
      "SELECT ca.k, n, label FROM ca JOIN cb ON ca.k = cb.k ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("x", 10L, "first"), ("y", 20L, "second")))
    spark.catalog.dropTempView("ca"); spark.catalog.dropTempView("cb")
  }
}
