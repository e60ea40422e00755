package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the warehouse contract the
  * reference declares in DDL (`sql_queries/synapse_table_creation.sql:5-22`:
  * NOT NULL columns, a logical primary key, typed domains) but never
  * enforces at load time. Each rule reduces to one aggregate; the report is
  * their union — a (rule, violations) relation a pipeline can gate on.
  *
  * Scale: every rule is a map-side-combinable aggregate over one scan (the
  * union shares the cached scan via Spark's exchange reuse where schemas
  * align); the FK rule is one anti-join against the referenced keys.
  * Nothing returns row-level data — violation EXAMPLES are a debugging
  * concern, counts are the gate.
  */
object Quality {

  sealed trait Rule { def name: String }
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null:$column"
  }
  /** Violations = rows beyond the first per key value (null keys ignored). */
  final case class Unique(column: String) extends Rule {
    def name = s"unique:$column"
  }
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    def name = s"accepted_values:$column"
  }
  /** Non-null left keys with no match in `ref(refColumn)`. */
  final case class ForeignKey(column: String, ref: DataFrame, refColumn: String) extends Rule {
    def name = s"foreign_key:$column"
  }

  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val frames = rules.map {
      case r @ NotNull(c) =>
        df.agg(count(when(col(c).isNull, 1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r @ Unique(c) =>
        df.agg((count(col(c)) - countDistinct(col(c))).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r @ AcceptedValues(c, vs) =>
        df.agg(count(when(col(c).isNotNull && !col(c).isin(vs: _*), 1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r @ ForeignKey(c, ref, rc) =>
        df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as("__ref_key")).distinct(),
            col(c) === col("__ref_key"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
    }
    frames.reduce(_ unionByName _)
  }
}
