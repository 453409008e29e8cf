package graft

import org.apache.spark.sql.types.DecimalType

/** Dev aid: list every registered query whose OUTPUT schema contains a
  * DecimalType column (`Test/runMain graft.SchemaAuditTool`). The driver's
  * hasher canonicalizes DECIMAL through a float64 round-trip on one side
  * and a fixed-scale decimal string on the other (VERDICT r8), so any
  * decimal on a gated surface is a hash lottery — the enforced ban lives
  * in RoundingAuditSpec; this tool is the enumeration aid.
  */
object SchemaAuditTool {
  def main(args: Array[String]): Unit = {
    val spark = GraftSpark.spark
    val sf = GraftSpark.sf
    val gated = graft.queries.Registry.oracles.keySet
    graft.queries.Registry.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val schema = fn(spark, sf).schema
        val dec = schema.fields.filter(_.dataType.isInstanceOf[DecimalType])
        if (dec.nonEmpty) {
          val tag = if (gated(name)) "GATED" else "rows-only"
          println(s"$tag $name: " + dec.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
        }
      } catch {
        case e: Throwable => println(s"ERROR $name: ${e.getMessage}")
      }
    }
    println("audit done")
  }
}
