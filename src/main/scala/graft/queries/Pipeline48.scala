package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Graph, TextOps}

/** Round-11 additions, part 13: normalization-tier dup recall, local
  * clustering coefficients, and streaming late-data DROP accounting.
  */
object Pipeline48 {

  def all: Seq[QueryDef] = Seq(d24, c12, st08)

  /** Exact-dup recall by normalization tier: the same corpus
    * fingerprinted four ways — raw bytes, lowercased, token-joined
    * (whitespace/punct-insensitive), and sorted-token bag — with per
    * tier the dup-group count, docs inside dup groups, and the micro
    * share. Each tier's equality is implied by the previous (equal
    * raw ⇒ equal lowered ⇒ equal tokens ⇒ equal bag), so dup mass is
    * provably MONOTONE down the table (pinned in PlanAudit) — the
    * measured answer to "which normalization buys how much recall".
    * Map-only hash projections + one partial agg per tier. */
  val d24: QueryDef = QueryDef(
    "d24_normalization_tiers",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = TextOps.tokens("text")
      def tier(name: String, hashExpr: String) = docs
        .selectExpr(s"'$name' AS tier", s"$hashExpr AS fp")
        .groupBy(col("tier"), col("fp")).agg(count(lit(1)).as("n"))
        .groupBy(col("tier"))
        .agg(coalesce(sum(expr("cast(n >= 2 as bigint)")), lit(0L)).as("n_dup_groups"),
          coalesce(sum(expr("if(n >= 2, n, 0L)")), lit(0L)).as("n_dup_docs"),
          sum(col("n")).as("n_docs"))
      tier("t0_raw", TextOps.strHash60("text"))
        .unionByName(tier("t1_lower", TextOps.strHash60("lower(text)")))
        .unionByName(tier("t2_tokens", TextOps.strHash60(s"concat_ws(' ', $toks)")))
        .unionByName(tier("t3_bag", TextOps.strHash60(s"concat_ws(' ', sort_array($toks))")))
        .selectExpr("tier", "n_dup_groups", "n_dup_docs",
          "cast((cast(n_dup_docs as decimal(38,0)) * 1000000) div n_docs as bigint) AS dup_docs_micro")
        .orderBy(col("tier"))
    },
    Some {
      def tierSql(name: String, h: String) =
        s"""SELECT '$name' AS tier,
          CAST(COALESCE(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_groups,
          CAST(COALESCE(sum(CASE WHEN n >= 2 THEN n ELSE 0 END), 0) AS BIGINT) AS n_dup_docs,
          CAST((CAST(COALESCE(sum(CASE WHEN n >= 2 THEN n ELSE 0 END), 0) AS HUGEINT)
            * 1000000) // sum(n) AS BIGINT) AS dup_docs_micro
        FROM (SELECT $h AS fp, count(*) AS n
              FROM (SELECT text, ${DuckOps.tokens("text")} AS tk FROM documents)
              GROUP BY 1)"""
      val t0 = tierSql("t0_raw", DuckOps.strHash60("text"))
      val t1 = tierSql("t1_lower", DuckOps.strHash60("lower(text)"))
      val t2 = tierSql("t2_tokens", DuckOps.strHash60("array_to_string(tk, ' ')"))
      val t3 = tierSql("t3_bag", DuckOps.strHash60("array_to_string(list_sort(tk), ' ')"))
      s"""SELECT * FROM ($t0 UNION ALL $t1 UNION ALL $t2 UNION ALL $t3)
      ORDER BY tier"""
    })

  /** Local clustering coefficient per nation in the trade graph:
    * 2·triangles / (deg·(deg−1)) in exact micro units, composed from
    * the degree-oriented triangle counts (c03's audited operator)
    * and one degree agg — "how clique-like is each nation's trade
    * neighborhood". Degree-1 nodes pin LCC to 0 (undefined, not an
    * error). */
  val c12: QueryDef = QueryDef(
    "c12_local_clustering",
    (s, d) => {
      val e = Pipeline11.tradeEdges(s, d)
      val und = e.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .filter(col("a") =!= col("b")).distinct()
      val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      Graph.triangleCounts(e, "src", "dst")
        .join(deg, Seq("id"))
        .selectExpr("cast(id as bigint) AS nation_id", "deg", "tri_n",
          "if(deg < 2, 0L, cast((cast(tri_n as decimal(38,0)) * 2000000) div " +
            "(cast(deg as decimal(38,0)) * (deg - 1)) as bigint)) AS lcc_micro")
        .orderBy(col("nation_id"))
    },
    Some(s"""WITH ${Pipeline11.tradeEdgesSql},
      und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e WHERE src <> dst GROUP BY 1, 2),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
      verts AS (SELECT x AS id FROM tri UNION ALL
                SELECT y FROM tri UNION ALL
                SELECT z FROM tri),
      cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS tri_n FROM verts GROUP BY 1),
      deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY 1)
      SELECT CAST(deg.id AS BIGINT) AS nation_id, deg.deg,
        CAST(COALESCE(cnt.tri_n, 0) AS BIGINT) AS tri_n,
        CAST(CASE WHEN deg.deg < 2 THEN 0
          ELSE (CAST(COALESCE(cnt.tri_n, 0) AS HUGEINT) * 2000000)
            // (CAST(deg.deg AS HUGEINT) * (deg.deg - 1)) END AS BIGINT) AS lcc_micro
      FROM deg LEFT JOIN cnt ON deg.id = cnt.id
      ORDER BY nation_id"""))

  /** Streaming LATE-DATA DROP accounting through the real engine:
    * st07 proved finalization on a clean split; here a pinned set of
    * STRAGGLERS (Jan 10–12 events with event_id % 7 = 0) is withheld
    * from the first drop and arrives in the second (drained after a
    * stop-and-resume from the shared checkpoint, so the drops are
    * guaranteed distinct micro-batches) — by then the watermark
    * (max(batch1 ts) − 1 s, i.e. late Jan 15) has passed them, so
    * the engine MUST drop every straggler: their windows were
    * finalized without them and append mode cannot revise. The
    * DuckDB oracle replays the rule analytically — aggregate the
    * corpus EXCLUDING the stragglers, report windows closed before
    * max(ts) − 1 s — so the hash match pins the drop semantics
    * cross-engine. (With watermark delay sized to real lateness the
    * stragglers would be kept; this query pins what happens when it
    * is not.) */
  val st08: QueryDef = QueryDef(
    "st08_late_data_drop",
    (s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("ts", "event_type", "event_id",
          "cast(round(value * 100) as long) AS cents")
      val straggler = "to_date(ts) >= '2024-01-10' AND to_date(ts) <= '2024-01-12'" +
        " AND event_id % 7 = 0"
      val slim = (df: org.apache.spark.sql.DataFrame) =>
        df.select(col("ts"), col("event_type"), col("cents"))
      val root = new java.io.File(Pipeline43.streamRoot, "st08")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      Pipeline43.deleteRec(streamDir); Pipeline43.deleteRec(ckpt)
      Pipeline43.deleteRec(sink)
      val base = System.currentTimeMillis()
      val schema = slim(ev).schema
      // single-lifetime waves (VERDICT r12 #5): the straggler-drop
      // semantics needs each drop in its OWN micro-batch (so the
      // watermark from drop 1 makes drop 2's stragglers late), not a
      // restart between drops — resume itself stays gated by st07
      // both drops materialized by ONE job (Pipeline43.prepareSlices;
      // the two filters are complementary, so this is a single scan
      // with a CASE label) and published as pure file copies — same
      // bytes per drop, same micro-batch boundaries
      Pipeline43.prepareSlices(root, ev.withColumn("__slice",
          when(expr(s"ts < timestamp'2024-01-16' AND NOT ($straggler)"), "batch1")
            .otherwise("batch2"))
        .select(col("ts"), col("event_type"), col("cents"), col("__slice")))
      Pipeline43.driveWavesSized(s, streamDir,
        Pipeline43.appendDailyStart(s, streamDir, ckpt, sink, schema),
        Seq(
          () => Pipeline43.dropSlice(root, streamDir, "batch1", base - 60000L),
          () => Pipeline43.dropSlice(root, streamDir, "batch2", base)))
      s.read.parquet(sink.toString)
        .select(col("day"), col("event_type"), col("n"), col("cents"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""WITH kept AS (SELECT * FROM events
               WHERE NOT (CAST(ts AS DATE) >= DATE '2024-01-10'
                 AND CAST(ts AS DATE) <= DATE '2024-01-12'
                 AND event_id % 7 = 0)),
      wm AS (SELECT max(ts) - INTERVAL 1 SECOND AS w FROM events),
      e AS (SELECT CAST(ts AS DATE) AS d, event_type,
              CAST(round(value * 100) AS BIGINT) AS cents FROM kept)
      SELECT CAST(d AS VARCHAR) AS day, event_type,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM e, wm WHERE CAST(d AS TIMESTAMP) + INTERVAL 1 DAY <= wm.w
      GROUP BY 1, 2 ORDER BY 1, 2"""))
}
