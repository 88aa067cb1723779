package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the dedup / similarity /
  * text operators. All are pure `functions._` compositions (JVM
  * higher-order functions — no Scala UDF serialization, no Python),
  * so they inline into Catalyst plans and stay partition-local.
  */
package object functions {

  /** Cosine similarity between two `array<double>` columns.
    * Sequential left-to-right accumulation (zip_with + aggregate), so
    * the result is bit-identical to a scalar loop over the elements.
    */
  def cosineSim(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na  = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb  = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Dot product of two `array<double>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an `array<double>` column. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
}
