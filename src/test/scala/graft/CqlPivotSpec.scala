package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.cql.{CqlPivot, CqlTable}
import graft.sstable.{CellOut, CompactedRow, SSTableFormat}

/** CQL relational pivot (M4) against the reference fixtures whose
  * decoded goldens are known (FIXTURES.md §1.1-1.2), plus synthetic
  * static-column and collection cases. */
class CqlPivotSpec extends AnyFunSuite {
  private val testRoot = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("CQL parse: keys, clustering, static, collections") {
    val t = CqlTable.parse(
      """CREATE TABLE ks.t (pk1 int, pk2 text, ck int, s text static,
        |v1 bigint, v2 list<blob>, v3 map<text, int>,
        |PRIMARY KEY ((pk1, pk2), ck)) WITH CLUSTERING ORDER BY (ck DESC)""".stripMargin)
    assert(t.partitionKeys.map(_.name) == Seq("pk1", "pk2"))
    assert(t.clusteringKeys.map(_.name) == Seq("ck"))
    assert(t.staticColumns.map(_.name) == Seq("s"))
    assert(t.regularColumns.map(_.name) == Seq("v1", "v2", "v3"))
  }

  test("CQL parse: real-world DDL formatting variants") {
    // lowercase + IF NOT EXISTS
    assert(CqlTable.parse("create table if not exists ks.t (a int primary key, b text)")
      .partitionKeys.map(_.name) == Seq("a"))
    // quoted identifiers + WITH clause containing parens/braces
    val q = CqlTable.parse(
      "CREATE TABLE \"Ks\".\"T\" (\n a int,\n b text,\n PRIMARY KEY (a)\n) " +
        "WITH CLUSTERING ORDER BY (b DESC) AND compaction = {'class': 'stcs'}")
    assert(q.name == "Ks.T" && q.partitionKeys.map(_.name) == Seq("a"))
    // thrift-era alias still emitted by old schema dumps
    assert(CqlTable.parse("CREATE COLUMNFAMILY t (a int PRIMARY KEY, b text)")
      .partitionKeys.map(_.name) == Seq("a"))
  }

  test("pivot randomtable fixtures to relational rows") {
    val atoms = GraftSSTable.readAtoms(spark, s"$testRoot/2.0.10/randomtable/input")
    val compacted = GraftSSTable.compact(atoms, numPartitions = 4)
    val df = GraftSSTable.pivotToRelational(compacted,
      """CREATE TABLE testdata.randomtable (key int PRIMARY KEY, guid blob,
        |name text, email text, words text, latlong list<blob>,
        |smallnumber int, rfc2822formatteddate timestamp)""".stripMargin)
    val rows = df.collect().map(r => r.getInt(0) -> r).toMap
    assert(rows.size == df.count().toInt)
    val r1 = rows(1)
    assert(r1.getAs[String]("name") == "Joel Head")
    assert(r1.getAs[String]("email") == "orci@lobortisClass.ca")
    assert(r1.getAs[String]("words") == "Lorem ipsum")
    assert(r1.getAs[Int]("smallnumber") == 0x75)
    assert(r1.getAs[Long]("rfc2822formatteddate") == 0x0000014e7b4832b0L)
    assert(r1.getSeq[Array[Byte]](r1.fieldIndex("latlong")).size == 2)
    assert(graft.sstable.CassType.hex(r1.getAs[Array[Byte]]("guid")) ==
      "d9c7b86f9da439ab3e262bddea0f4ea5")
  }

  test("end-to-end: raw sstables -> compact -> pivot -> parquet -> relational query") {
    // the full product journey a migrating user runs: snapshot in,
    // relational warehouse table out, queried with plain Spark SQL
    val atoms = GraftSSTable.readAtoms(spark, s"$testRoot/2.0.10/randomtable/input")
    val pivoted = GraftSSTable.pivotToRelational(
      GraftSSTable.compact(atoms, numPartitions = 4),
      """CREATE TABLE testdata.randomtable (key int PRIMARY KEY, guid blob,
        |name text, email text, words text, latlong list<blob>,
        |smallnumber int, rfc2822formatteddate timestamp)""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("graft_e2e").toFile
    try {
      pivoted.write.mode("overwrite").parquet(s"$out/warehouse")
      val tbl = spark.read.parquet(s"$out/warehouse")
      tbl.createOrReplaceTempView("randomtable")
      // every source row survives the chain with its key intact
      assert(tbl.count() == pivoted.count() && tbl.count() > 0)
      val agg = spark.sql(
        """SELECT count(*) AS n, count(DISTINCT key) AS nk,
          |       sum(smallnumber) AS total, max(length(name)) AS maxname
          |FROM randomtable""".stripMargin).head()
      assert(agg.getLong(0) == agg.getLong(1), "key is unique through the pivot")
      // pin two content aggregates so a silent value corruption anywhere
      // in the chain (decode, merge, pivot, parquet codec) fails here
      val direct = pivoted.selectExpr("sum(smallnumber)", "max(length(name))").head()
      assert(agg.getLong(2) == direct.getLong(0))
      assert(agg.getInt(3) == direct.getInt(1))
    } finally TestUtil.deleteRecursively(out)
  }

  test("pivot rangetombstone fixtures (clustering + tombstoned columns)") {
    val atoms = GraftSSTable.readAtoms(spark, s"$testRoot/2.0.10/rangetombstone/input")
    val compacted = GraftSSTable.compact(atoms, numPartitions = 4)
    val df = GraftSSTable.pivotToRelational(compacted,
      """CREATE TABLE testdata.rangetombstone (key ascii, ck int,
        |columna int, columnb int, columnc int, PRIMARY KEY (key, ck))""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("key") == "row1")
    assert(r.getAs[Int]("ck") == 1)
    assert(r.getAs[Int]("columna") == 3)
    // columnb was covered by the range tombstone -> null after compaction
    assert(r.isNullAt(r.fieldIndex("columnb")))
    assert(r.getAs[Int]("columnc") == 3)
  }

  test("static columns and map collections (synthetic)") {
    import spark.implicits._
    def comp(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p =>
        out.write(p.length >> 8); out.write(p.length & 0xff)
        out.write(p); out.write(0)
      }
      out.toByteArray
    }
    def static(parts: Array[Byte]*): Array[Byte] =
      Array[Byte](0xff.toByte, 0xff.toByte) ++ comp(parts: _*)
    def s(x: String): Array[Byte] = x.getBytes("UTF-8")
    def i32(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v).array()

    def cell(name: Array[Byte], value: Array[Byte], ts: Long) =
      CellOut(SSTableFormat.KindColumn, name, value, ts, None, None, None)

    val row = CompactedRow(i32(7), Long.MinValue, Seq(
      cell(static(s("stot")), i32(99), 10L),                 // static column
      cell(comp(i32(1), s("")), Array.emptyByteArray, 10L),  // row marker
      cell(comp(i32(1), s("m"), s("k1")), i32(5), 10L),      // map entry
      cell(comp(i32(1), s("m"), s("k2")), i32(6), 10L),
      cell(comp(i32(1), s("v")), i32(42), 10L)))             // regular

    val ds = spark.createDataset(Seq(row))
    val df = CqlPivot.pivot(ds,
      "CREATE TABLE t (pk int, ck int, stot int static, v int, m map<text, int>, PRIMARY KEY (pk, ck))")
    val r = df.collect().head
    assert(r.getAs[Int]("pk") == 7)
    assert(r.getAs[Int]("ck") == 1)
    assert(r.getAs[Int]("stot") == 99)
    assert(r.getAs[Int]("v") == 42)
    assert(r.getAs[Map[String, Int]]("m") == Map("k1" -> 5, "k2" -> 6))
  }

  test("wide-row valve drops an over-cap partition and counts it (no OOM path)") {
    import spark.implicits._
    def comp(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p =>
        out.write(p.length >> 8); out.write(p.length & 0xff)
        out.write(p); out.write(0)
      }
      out.toByteArray
    }
    def s(x: String): Array[Byte] = x.getBytes("UTF-8")
    def i32(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def cell(name: Array[Byte], value: Array[Byte], ts: Long) =
      CellOut(SSTableFormat.KindColumn, name, value, ts, None, None, None)

    // "wide": 200 cells of ~30 bytes each; "narrow": 1 cell
    val wide = CompactedRow(i32(1), Long.MinValue,
      (1 to 200).map(i => cell(comp(i32(i), s("v")), i32(i), 10L)))
    val narrow = CompactedRow(i32(2), Long.MinValue,
      Seq(cell(comp(i32(1), s("v")), i32(7), 10L)))
    val cql = "CREATE TABLE t (pk int, ck int, v int, PRIMARY KEY (pk, ck))"

    val ds = spark.createDataset(Seq(wide, narrow))
    val capped = CqlPivot.pivot(ds, cql, maxRowBytes = 1024)
    val rows = capped.collect()
    assert(rows.map(_.getAs[Int]("pk")).toSeq == Seq(2),
      "the over-cap partition must be dropped, the narrow one kept")
    assert(CqlPivot.rowsTooBig.map(_.value.toLong).contains(1L),
      "dropped wide rows must be counted for the driver-side assert")

    // uncapped default still pivots everything
    assert(CqlPivot.pivot(ds, cql).count() == 201L)
  }
}
