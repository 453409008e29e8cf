package graft

import graft.queries.Registry

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing query registry itself.
  *
  * The driver's comparator (pandas hash-compare against DuckDB) can only
  * handle flat scalar cells: round 3 lost q67/q68 to raw binary output
  * columns (`TypeError: unhashable type: 'bytearray'`) that no unit test
  * had flagged. This spec makes that class of registration error fail in
  * `sbt test` instead of in the round gate.
  */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  /** Types the driver comparator is known to hash safely. */
  private def comparatorSafe(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false // binary, arrays, maps, structs, null, interval…
  }

  test("every registered query's output schema is comparator-safe") {
    // Building the DataFrame is enough — schemas are known pre-action.
    // (Eager registrants — streaming runs, ML fits — execute here at
    // sf0.001; their intermediates are session-memoized and shared with
    // the other suites, so the marginal cost stays small.)
    val offenders = Registry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val bad = q(spark, sf).schema.fields.filterNot(f => comparatorSafe(f.dataType))
      bad.map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"comparator-unsafe output columns registered (hex/md5-encode or " +
        s"explode them): ${offenders.mkString(", ")}")
  }

  test("every oracle key names a registered query") {
    val orphans = Registry.oracles.keySet -- Registry.all.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }
}
