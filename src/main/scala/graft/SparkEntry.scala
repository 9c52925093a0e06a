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
    * (independent of sfDir). The oracle is the reference's checked-in
    * golden output itself, loaded line-wise by DuckDB — so the driver
    * hash-compares our distributed compaction byte-for-byte against
    * the reference run (same proof the SSTableGoldenSpec makes). */
  val cassCompaction: QueryDef = QueryDef(
    "cass_compaction",
    (s, _) => {
      import org.apache.spark.sql.functions._
      val root = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"
      val atoms = GraftSSTable.readAtoms(s, s"$root/2.0.10/randomtable/input",
        Map("skipCorrupt" -> "true"))
      GraftSSTable.aegJsonLines(GraftSSTable.compact(atoms))
        .toDF("key", "line")
        .select(col("line"))
        .orderBy(col("line"))
    },
    // the golden file contains no '|' (verified), so a '|' delimiter
    // with quoting disabled yields exactly one VARCHAR column per line
    Some("""SELECT line FROM read_csv(
        '/root/reference/aegisthus-hadoop/src/test/resources/testdata/2.0.10/randomtable/aeg_json_output/aeg-00000',
        delim='|', header=false, quote='', escape='', columns={'line': 'VARCHAR'})
      ORDER BY line"""))

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
