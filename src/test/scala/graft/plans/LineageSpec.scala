package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

case class LinT(a: Long, b: Double, g: String)
case class LinL(k: Long, payload: String)
case class LinR(k2: Long, v: Double)

class LineageSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    Lineage.columnLineage(df).toSet

  test("projections, aliases, and expressions trace to their leaf columns") {
    val s = spark
    import s.implicits._
    // case-class relations: the LEAF attributes carry the real names (a
    // bare toDF rename is itself a Project the tracer correctly crosses)
    val t = Seq(LinT(1L, 2.0, "x")).toDS().toDF()
    // rename, arithmetic over two columns, constant-only column
    val out = t.select(col("a").as("id"), (col("b") * 2 + col("a")).as("score"),
      lit(1).as("one"))
    assert(pairs(out) == Set("id" -> "a", "score" -> "a", "score" -> "b"))
    // alias-of-alias chains collapse to the leaf
    val twice = out.select(col("score").as("final_score"))
    assert(pairs(twice) == Set("final_score" -> "a", "final_score" -> "b"))
  }

  test("filters and join keys are NOT data lineage; join payload traces per side") {
    val s = spark
    import s.implicits._
    val l = Seq(LinL(1L, "pay")).toDS().toDF()
    val r = Seq(LinR(1L, 9.0)).toDS().toDF()
    val j = l.join(r, col("k") === col("k2")).filter(col("v") > 0)
      .select(col("payload"), (col("v") * 2).as("vv"))
    assert(pairs(j) == Set("payload" -> "payload", "vv" -> "v"))
  }

  test("aggregates, windows, unions, and explode trace correctly") {
    val s = spark
    import s.implicits._
    val t = Seq(LinT(1L, 2.0, "g")).toDS().toDF()
    val agg = t.groupBy(col("g").as("grp")).agg(sum(col("b") + col("a")).as("s"))
    assert(pairs(agg) == Set("grp" -> "g", "s" -> "a", "s" -> "b"))
    val w = t.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("a"))).select("rn")
    assert(pairs(w) == Set("rn" -> "g", "rn" -> "a"))
    // union is positional: the same output column draws from BOTH branches
    val u = t.select(col("a").as("x")).union(t.select(col("b").cast("long").as("x")))
    assert(pairs(u) == Set("x" -> "a", "x" -> "b"))
    val ex = t.select(explode(array(col("g"), col("g"))).as("piece"))
    assert(pairs(ex) == Set("piece" -> "g"))
  }

  test("controlLineage: filter/join/grouping columns, not output inputs") {
    val s = spark
    import s.implicits._
    val l = Seq(LinL(1L, "pay")).toDS().toDF()
    val r = Seq(LinR(1L, 9.0)).toDS().toDF()
    val q = l.join(r, col("k") === col("k2"))
      .filter(col("v") > 0)
      .groupBy(col("payload")).agg(count(lit(1)).as("n"))
    // data lineage of the output: payload only (n is a constant count)
    assert(pairs(q) == Set("payload" -> "payload"))
    // control: join keys, the filter column, and the grouping key
    assert(Lineage.controlLineage(q) == Seq("k", "k2", "payload", "v"))
    // a filter through an alias traces to the leaf
    val aliased = l.select(col("payload").as("p2"), col("k")).filter(col("p2") === "x")
    assert(Lineage.controlLineage(aliased).contains("payload"))
  }
}
