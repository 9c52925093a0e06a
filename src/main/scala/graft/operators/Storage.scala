package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Executor-storage lifecycle for operators that need a shared
  * intermediate (signatures, assignments) referenced by several
  * branches of one plan.
  *
  * The hygiene contract: an operator may cache internally, but the
  * cache must not outlive the call — a library caller in a long-lived
  * session must not accumulate CacheManager entries it never asked
  * for (the round-7 leak: five operators cached corpus-sized
  * signature frames forever). [[withCached]] realizes
  * "unpersist-after-materialize": the intermediate is cached only
  * while the RESULT is built and eagerly materialized
  * (`localCheckpoint`), then released. What remains is the result's
  * own checkpoint blocks — O(result), not O(corpus) — owned by the
  * returned frame: freed deterministically via [[release]], or by the
  * ContextCleaner once the frame is unreachable.
  */
object Storage {

  /** Cache `tmp` for the duration of building AND materializing the
    * result, then release it. The result comes back
    * lineage-truncated (localCheckpoint, spillable MEMORY_AND_DISK):
    * downstream consumers re-read the materialized blocks instead of
    * re-running the plan, and the unpersisted intermediate can never
    * be silently recomputed-and-recached by a later action. */
  private[graft] def withCached(tmp: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    tmp.cache()
    try build(tmp).localCheckpoint(eager = true)
    finally tmp.unpersist(blocking = false)
  }

  /** The cached RDDs behind a `localCheckpoint`ed frame (the blocks
    * `Dataset.unpersist` does NOT release — checkpoint storage is
    * owned by the underlying RDD, not the Dataset cache). */
  private[graft] def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case r: LogicalRDD => r.rdd }

  /** Free the executor blocks behind an operator result produced by
    * [[withCached]] (or any localCheckpoint'ed frame). Safe to call
    * after the caller's terminal action; the frame must not be used
    * afterwards. */
  def release(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(blocking = false))
}
