package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType}

/** SQL-callable surface for the engine's custom Catalyst expressions:
  * one builder table serving BOTH registration paths —
  * [[graft.plans.GraftExtensions]] injects them into new sessions
  * (`spark.sql.extensions=graft.plans.GraftExtensions`), and
  * [[registerTemp]] drops the same builders into an existing session's
  * registry (the harness path). Either way, plain SQL text can call
  * `hash60(...)`, `dot_product(...)`, `bottom_k(...)`,
  * `t_digest_quantiles(...)` — a user of the SQL front door gets the
  * whole extension surface, not just the Column API.
  *
  * Config-style arguments (k, percentiles, compression) must be
  * foldable — they parameterize the aggregate object itself, so they
  * are evaluated at resolution time and rejected otherwise.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case v => throw new IllegalArgumentException(
        s"$fn: expected a literal integer, got $v")
    } else throw new IllegalArgumentException(
      s"$fn: expected a foldable integer argument, got ${e.sql}")

  private def doubleSeqArg(e: Expression, fn: String): Seq[Double] =
    if (e.foldable) (e.eval(), e.dataType) match {
      case (ad: ArrayData, ArrayType(DoubleType, _)) =>
        ad.toDoubleArray().toSeq
      case (ad: ArrayData, ArrayType(dt: DecimalType, _)) =>
        ad.toArray[Decimal](dt).map(_.toDouble).toSeq
      case (v, t) => throw new IllegalArgumentException(
        s"$fn: expected a literal array<double>, got $v: $t")
    } else throw new IllegalArgumentException(
      s"$fn: expected a foldable array argument, got ${e.sql}")

  private def arity(es: Seq[Expression], n: Seq[Int], fn: String): Unit =
    require(n.contains(es.length),
      s"$fn expects ${n.mkString(" or ")} arguments, got ${es.length}")

  /** name → builder, for every SQL-exposed engine function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hash60" -> { es =>
      arity(es, Seq(1), "hash60"); Hash60(es.head)
    },
    "dot_product" -> { es =>
      arity(es, Seq(2), "dot_product"); DotProduct(es(0), es(1))
    },
    "bottom_k" -> { es =>
      arity(es, Seq(2), "bottom_k")
      BottomK(es(0), intArg(es(1), "bottom_k")).toAggregateExpression()
    },
    "z_order" -> { es =>
      arity(es, Seq(2, 3), "z_order")
      val bits = if (es.length == 3) intArg(es(2), "z_order") else 16
      ZOrder64(es(0), es(1), bits)
    },
    "t_digest_quantiles" -> { es =>
      arity(es, Seq(2, 3), "t_digest_quantiles")
      val compression = if (es.length == 3)
        intArg(es(2), "t_digest_quantiles") else 200
      TDigestQuantiles(es(0), doubleSeqArg(es(1), "t_digest_quantiles"),
        compression).toAggregateExpression()
    })

  /** Register every function into an existing session (idempotent). */
  def registerTemp(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      Shim.registerFunction(spark, name, builder)
    }
}
