package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full operator registry; each entry is one operator from
    * SURVEY.md §2 (or the extended LLM-pipeline surface). */
  def registry: Seq[QueryDef] =
    Relational.all ++ Relational2.all ++ Pipeline.all ++ Seq(cassCompaction)

  /** The reference's core operator (SURVEY §2.4 A1): distributed
    * SSTable compaction over the reference's own binary fixtures
    * (independent of sfDir; no SQL oracle — correctness is proven by
    * the byte-exact golden-file suite in SSTableGoldenSpec). */
  val cassCompaction: QueryDef = QueryDef(
    "cass_compaction",
    (s, _) => {
      import org.apache.spark.sql.functions._
      val root = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"
      val atoms = GraftSSTable.readAtoms(s, s"$root/2.0.10/randomtable/input",
        Map("skipCorrupt" -> "true"))
      GraftSSTable.aegJsonLines(GraftSSTable.compact(atoms, 8))
        .toDF("key", "line")
        .select(lower(hex(col("key"))).as("hex_key"), col("line"))
        .orderBy(col("hex_key"))
    },
    None)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q06.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
