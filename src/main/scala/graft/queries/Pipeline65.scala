package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Graph}

/** Round-11 additions, part 30: eccentricity/diameter face of the
  * BFS machinery, the annealed natural→uniform mixture schedule,
  * and per-channel image stats through the real PPM codec.
  */
object Pipeline65 {

  def all: Seq[QueryDef] = Seq(c15, p43, m16)

  /** Eccentricity ([[graft.operators.Graph.eccentricity]]) of every
    * node of the directed event-type graph — the longest shortest
    * path out of each state (max(ecc) is the reachable diameter).
    * Same frontier BFS, bounded-vocabulary contract, and
    * fresh-attribute union barrier as c14; the oracle replays the
    * same depth-capped walk with max(d) instead of the harmonic
    * sum, node list deduped explicitly (the c14 DuckDB
    * UNION-in-RECURSIVE lesson). */
  val c15: QueryDef = QueryDef(
    "c15_eccentricity",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("s"))
        .withColumn("t", lead(col("s"), 1).over(w))
        .filter(col("t").isNotNull)
        .select(col("s"), col("t"))
      Graph.eccentricity(edges, "s", "t").orderBy(col("node"))
    },
    Some("""WITH RECURSIVE ed AS MATERIALIZED (
        SELECT DISTINCT s, t FROM (
          SELECT event_type AS s,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
          FROM events) WHERE t IS NOT NULL AND s <> t),
      nodes AS (SELECT DISTINCT n FROM
        (SELECT s AS n FROM ed UNION ALL SELECT t AS n FROM ed)),
      walk(s, t, d) AS (
        SELECT s, t, 1 FROM ed
        UNION
        SELECT w.s, e.t, w.d + 1 FROM walk w JOIN ed e ON w.t = e.s
        WHERE w.s <> e.t AND w.d < 50),
      sp AS (SELECT s, t, min(d) AS d FROM walk GROUP BY 1, 2)
      SELECT n.n AS node,
        CAST(COALESCE(max(sp.d), 0) AS BIGINT) AS ecc,
        CAST(count(sp.d) AS BIGINT) AS n_reachable
      FROM nodes n LEFT JOIN sp ON n.n = sp.s
      GROUP BY 1 ORDER BY 1"""))

  /** Annealed mixture schedule
    * ([[graft.operators.Curate.annealedMixture]], 4 epochs): the
    * per-epoch source sampling weights walking linearly from the
    * corpus's natural token shares to uniform — exact micro
    * interpolation whose signed `div` truncates identically in both
    * engines. */
  val p43: QueryDef = QueryDef(
    "p43_annealed_mixture",
    (s, d) => Curate.annealedMixture(Tables.documents(s, d), "source", "text", 4),
    Some("""WITH per AS (SELECT source,
               CAST(sum(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> ''))) AS BIGINT) AS w
             FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_sources FROM per),
      base AS (SELECT source,
                 CAST(CAST(w AS HUGEINT) * 1000000 // total AS BIGINT)
                   AS natural_micro,
                 CAST(1000000 // n_sources AS BIGINT) AS uniform_micro
               FROM per, tot)
      SELECT CAST(e AS BIGINT) AS epoch, source, natural_micro, uniform_micro,
        CAST(natural_micro + (uniform_micro - natural_micro) * e // 3 AS BIGINT)
          AS weight_micro
      FROM base, unnest(range(0, 4)) AS t(e)
      ORDER BY epoch, source"""))

  /** Per-channel image means + 4-bucket intensity histogram
    * ([[graft.operators.Multimodal.channelStats]]) through the real
    * PPM decoder over the canonical deterministic media table
    * (images are the `doc_id % 3 = 0` residue); the oracle replays
    * the pixel generator analytically. */
  val m16: QueryDef = QueryDef(
    "m16_channel_stats",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.channelStats(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .toDF().orderBy(col("media_id"))
    },
    Some("""WITH px AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
               CAST((doc_id * 31 + i * 7) % 256 AS BIGINT) AS v
             FROM documents,
               unnest(range(0, 3 * (4 + doc_id % 29) * (4 + doc_id % 23))) AS t(i)
             WHERE doc_id % 3 = 0),
      agg AS (SELECT doc_id,
               CAST(sum(CASE WHEN i % 3 = 0 THEN v END) AS BIGINT) AS rs,
               CAST(sum(CASE WHEN i % 3 = 1 THEN v END) AS BIGINT) AS gs,
               CAST(sum(CASE WHEN i % 3 = 2 THEN v END) AS BIGINT) AS bs,
               CAST(sum(CASE WHEN v // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
               CAST(sum(CASE WHEN v // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
               CAST(sum(CASE WHEN v // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
               CAST(sum(CASE WHEN v // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
             FROM px GROUP BY 1)
      SELECT doc_id AS media_id,
        CAST(4 + doc_id % 29 AS BIGINT) AS width,
        CAST(4 + doc_id % 23 AS BIGINT) AS height,
        rs // ((4 + doc_id % 29) * (4 + doc_id % 23)) AS r_mean,
        gs // ((4 + doc_id % 29) * (4 + doc_id % 23)) AS g_mean,
        bs // ((4 + doc_id % 29) * (4 + doc_id % 23)) AS b_mean,
        h0, h1, h2, h3
      FROM agg ORDER BY 1"""))
}
