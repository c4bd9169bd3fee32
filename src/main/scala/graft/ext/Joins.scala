package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe join strategies (beyond-reference scope, SURVEY.md §2c).
  *
  * The hot-key problem: a shuffle join hashes on the key, so one
  * viral key drags its entire row population into a single reducer —
  * the job runs at the speed of that straggler no matter how many
  * executors exist. AQE's skew-join split handles sort-merge cases
  * adaptively; THIS operator is the deterministic form for when the
  * build side is small enough to replicate but too big to broadcast,
  * or when AQE is unavailable (plan-stable pipelines).
  */
object Joins {

  /** Salted inner equi-join: the probe (large, skewed) side scatters
    * each row into one of `buckets` salt lanes; the build side
    * replicates `buckets`× (one copy per lane) and the join runs on
    * (keys, salt) — a hot key's rows now land on `buckets` reducers
    * instead of one. The RESULT is exactly the plain inner join: every
    * probe row still meets every matching build row exactly once (in
    * its own lane), whatever the salt values are — so the salt needs
    * no determinism, only spread.
    *
    * Cost: build side bytes × buckets through the shuffle — use a
    * bucket count sized to the skew, not blindly large. Join keys must
    * be non-null on the probe side to matter (null never equi-joins).
    */
  def salted(probe: DataFrame, build: DataFrame, keys: Seq[String],
             buckets: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(buckets > 1, "buckets must exceed 1 (1 bucket IS the plain join)")
    val saltedProbe = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedProbe.join(replicated, keys :+ "__salt")
      .drop("__salt")
  }
}
