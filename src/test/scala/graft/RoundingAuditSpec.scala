package graft

import graft.queries.Registry

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Floor, Remainder, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** Rounding-boundary audit (VERDICT r7 §next-round 2, ARCHITECTURE.md
  * determinism rules): no ORACLE-GATED query may put a DOUBLE through
  * `round()` or a raw double→DECIMAL cast anywhere in its plan. Both
  * resolve half-boundaries by an engine-release-dependent rounding mode
  * (Spark: BigDecimal HALF_UP on the exact binary value; DuckDB: changed
  * across releases), so a query that is value-equal under one DuckDB can
  * go hash-red under the driver's — the r6/r7 failure class. The
  * compliant quantizers are [[graft.functions.GraftFunctions.qround]] /
  * `qdec` (IEEE `floor(x·10ⁿ + 0.5)`, bit-identical in every engine);
  * their plans are recognized here by the `Floor` node feeding the cast.
  *
  * Rows-only (`no_oracle`) queries are exempt: they face no cross-engine
  * compare, and ML-derived doubles (ALS scores, KMeans distances) are
  * not oracle-reproducible to begin with.
  */
class RoundingAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  /** Flags: `round(double, _)` anywhere; Cast(double → decimal) whose
    * operand — resolved through Alias hops across the plan, so an
    * upstream-Project-quantized attribute conforms — does not come from
    * a sanctioned quantizer. Two quantizer families are recognized:
    * the `Floor` node (qround/qdec's floor(x·10ⁿ + 0.5)) and the
    * `Remainder` node (qroundWide/qdecWide's saturation-free
    * y − fmod(y, 1) identity — r13: q319's rank-sum terms carry no
    * upstream Floor, so the wide quantizer must be recognized by its
    * own fingerprint, not by luck of a floored input). */
  private def audit(plan: LogicalPlan): Seq[String] = {
    val defs = scala.collection.mutable.HashMap[Long, Expression]()
    plan.foreachWithSubqueries { p =>
      p.expressions.foreach(_.foreach {
        case a: Alias => defs(a.exprId.id) = a.child
        case _ => ()
      })
    }
    def quantized(e: Expression, depth: Int): Boolean =
      depth <= 8 && e.exists {
        case _: Floor => true
        case _: Remainder => true
        case ar: AttributeReference =>
          defs.get(ar.exprId.id).exists(quantized(_, depth + 1))
        case _ => false
      }
    val bad = scala.collection.mutable.ListBuffer[String]()
    plan.foreachWithSubqueries { p =>
      p.expressions.foreach(_.foreach {
        case r: Round if r.child.dataType == DoubleType =>
          bad += s"round(double): ${r.sql.take(120)}"
        case c: Cast
            if c.child.dataType == DoubleType &&
              c.dataType.isInstanceOf[DecimalType] &&
              !quantized(c.child, 0) =>
          bad += s"cast(double as ${c.dataType.simpleString}): ${c.sql.take(120)}"
        case _ => ()
      })
    }
    bad.distinct.toSeq
  }

  /** r9 (VERDICT r8): the driver's hasher canonicalizes DECIMAL through
    * a float64 round-trip on one side and a fixed-scale decimal string
    * on the other — every hash-red in 8 rounds had a DECIMAL output
    * column and no DOUBLE/BIGINT surface ever went red. Decimal/integer
    * arithmetic stays the right tool INTERNALLY (order-free exact
    * sums); this test bans it from the OUTPUT surface of every
    * registered query: project through GraftFunctions.decOut (DOUBLE),
    * a plain long cast, or decFold (mod-2⁶³ BIGINT) instead. */
  test("no registered query emits a DecimalType output column") {
    val offenders = Registry.all.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val dec =
          try fn(spark, sf).schema.fields
            .filter(_.dataType.isInstanceOf[DecimalType])
            .map(f => s"${f.name}: ${f.dataType.simpleString}")
          catch { case e: Throwable => Array(s"BUILD FAILED: ${e.getMessage}") }
        if (dec.isEmpty) Nil else Seq(s"$name → ${dec.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"\n${offenders.size} queries put DecimalType on the output " +
        s"surface (decimal inside, double/bigint out):\n" +
        offenders.mkString("\n"))
  }

  test("no oracle-gated query rounds a double with a mode-dependent op") {
    val gated = Registry.oracles.keySet
    val report = Registry.all.toSeq.sortBy(_._1)
      .filter { case (name, _) => gated(name) }
      .flatMap { case (name, fn) =>
        val hits =
          try audit(fn(spark, sf).queryExecution.analyzed)
          catch { case e: Throwable => Seq(s"BUILD FAILED: ${e.getMessage}") }
        if (hits.isEmpty) Nil else Seq(s"$name:\n  ${hits.mkString("\n  ")}")
      }
    assert(report.isEmpty,
      s"\n${report.size} queries use rounding-mode-dependent ops:\n" +
        report.mkString("\n"))
  }
}
