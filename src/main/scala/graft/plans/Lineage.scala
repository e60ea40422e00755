package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level data lineage from the analyzed Catalyst plan: for every
  * output column of a DataFrame, the set of LEAF relation columns it is
  * computed from. The impact-analysis tool — "which source columns feed
  * this report cell", "what breaks if we drop/redact column X" — derived
  * from the plan itself, so it is exact for whatever the optimizer will
  * run, not a guess from SQL text.
  *
  * Semantics: DATA lineage only — columns an output VALUE is computed
  * from, traced through Project/Aggregate/Window expression trees (alias
  * references), Union positions, and Generate (explode) generator inputs;
  * pass-through operators (Filter/Join/Sort/…) are crossed by attribute
  * identity (`exprId`). Columns that only gate WHICH rows appear (filter
  * predicates, join keys) are control lineage, a different question this
  * tool deliberately does not mix in — a redaction audit needs the two
  * lists separately, and the control set is one `plan.collect{ case
  * f: Filter => f.condition.references }` away.
  *
  * Driver-side plan analysis — cost is plan size, never data size; safe at
  * any scale.
  */
object Lineage {

  /** Leaf column names feeding `attr`, traced through `plan`. */
  private def trace(attr: Attribute, plan: LogicalPlan): Set[String] = plan match {
    case l: LeafNode =>
      if (l.outputSet.contains(attr)) Set(attr.name) else Set.empty
    case u: Union =>
      // union output is positional: column i of the union is column i of
      // every child, whatever those are named
      val i = u.output.indexWhere(_.exprId == attr.exprId)
      if (i >= 0) u.children.flatMap(c => trace(c.output(i), c)).toSet
      else u.children.flatMap(c => trace(attr, c)).toSet
    case g: Generate if g.generatorOutput.exists(_.exprId == attr.exprId) =>
      g.generator.references.flatMap(r => traceInChildren(r, g.children)).toSet
    case e: Expand =>
      // expand output is positional across its row-multiplying projections
      val i = e.output.indexWhere(_.exprId == attr.exprId)
      if (i >= 0)
        e.projections.flatMap(p => p(i).references)
          .flatMap(r => traceInChildren(r, e.children)).toSet
      else traceInChildren(attr, e.children)
    case p =>
      producerOf(attr, p) match {
        case Some(ne) =>
          ne.references.flatMap(r => traceInChildren(r, p.children)).toSet
        case None => traceInChildren(attr, p.children)
      }
  }

  private def traceInChildren(attr: Attribute, children: Seq[LogicalPlan]): Set[String] =
    children.filter(_.outputSet.contains(attr)).flatMap(c => trace(attr, c)).toSet

  /** The NamedExpression computing `attr` at THIS operator, if it is not a
    * pass-through of a child attribute.
    */
  private def producerOf(attr: Attribute, plan: LogicalPlan): Option[NamedExpression] = {
    val named: Seq[NamedExpression] = plan match {
      case p: Project => p.projectList
      case a: Aggregate => a.aggregateExpressions
      case w: Window => w.windowExpressions
      case _ => Nil
    }
    named.find(ne => ne.exprId == attr.exprId && !ne.isInstanceOf[Attribute])
  }

  /** (out_col, src_col) pairs for every output column of `df`. */
  def columnLineage(df: DataFrame): Seq[(String, String)] = {
    val plan = df.queryExecution.analyzed
    plan.output.flatMap(a => trace(a, plan).toSeq.sorted.map(a.name -> _))
  }

  /** The same relation as a DataFrame (for SQL-facing consumers). */
  def lineageDf(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    columnLineage(df).toDF("out_col", "src_col")
  }

  /** CONTROL lineage: leaf columns that gate WHICH rows appear — filter
    * predicates, join conditions, and aggregate grouping keys — without
    * feeding any output value directly. The redaction-audit complement to
    * [[columnLineage]]: dropping one of these changes the result even
    * though no output cell is "computed from" it.
    */
  def controlLineage(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    val traced = scala.collection.mutable.Set.empty[String]
    plan.foreach {
      case f: Filter =>
        f.condition.references.foreach(r => traced ++= trace(r, f.child))
      case j: Join =>
        j.condition.foreach(_.references.foreach { r =>
          j.children.filter(_.outputSet.contains(r))
            .foreach(c => traced ++= trace(r, c))
        })
      case a: Aggregate =>
        a.groupingExpressions.foreach(_.references.foreach(r =>
          traced ++= trace(r, a.child)))
      case _ =>
    }
    traced.toSeq.sorted
  }
}
