package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join pattern (100 TB discipline, build brief): when one
  * join key dominates, hash-partitioned joins put that key's entire volume
  * on one task. Salting splits it: the big side gets a deterministic salt
  * in [0, n) derived from a high-cardinality column, the small side is
  * replicated n×, and the join runs on (key, salt) — same rows out, n-way
  * parallel on the hot key. AQE's skew-join handles moderate skew
  * automatically; this is the explicit form for pathological keys.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. `saltSrc`
    * must be a deterministic high-cardinality expression on the big side
    * (a row id); result equals the unsalted join exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSrc: Column): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(saltSrc), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(typedLit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
