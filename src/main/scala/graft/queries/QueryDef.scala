package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query exposed through [[graft.SparkEntry]].
  *
  * @param name   stable key (drives CORRECTNESS_r{N}.json entries)
  * @param run    (spark, sfDir) => result DataFrame
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None => driver falls back to a rows-only check
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Deterministic-sum helper rationale (used across query files):
    * double SUMs are order-sensitive, so any oracle-checked aggregate
    * first rounds each row term to an integer number of micro-units
    * (x*1e6, round-half-up — bit-identical in Spark and DuckDB because
    * the per-row product is a single IEEE op) and sums exact BIGINTs.
    * Dividing the exact integer by 1e6 at the end is again a single
    * deterministic IEEE op, so results hash-match across engines.
    */
  val MicroScale: Double = 1e6
}
