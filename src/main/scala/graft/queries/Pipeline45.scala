package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Dedup, Events, Graph}

/** Round-11 additions, part 10: degree assortativity of the dup
  * graph, conversion-latency distribution, and deterministic
  * stratified hash sampling.
  */
object Pipeline45 {

  def all: Seq[QueryDef] = Seq(c11, e32, p36)

  /** Degree assortativity
    * ([[graft.operators.Graph.degreeAssortativity]]) of the d03
    * MinHash-LSH dup graph: do template hubs link template hubs?
    * All moments exact BIGINT, final ratio exact integer micro. */
  val c11: QueryDef = QueryDef(
    "c11_degree_assortativity",
    (s, d) => Graph.degreeAssortativity(
      Dedup.minhashLshPairs(Tables.documents(s, d), "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2")),
      "d1", "d2"),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT doc_id, ${DuckOps.minhashSig("h", 16)} AS sig FROM hs),
      bands AS (SELECT doc_id, b, ${DuckOps.foldHash("sig[b * 4 + 1 : b * 4 + 4]")} AS bucket
                FROM sig, unnest(range(0, 4)) AS t(b)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      pairs AS (SELECT d1, d2 FROM cand
                JOIN sig s1 ON d1 = s1.doc_id JOIN sig s2 ON d2 = s2.doc_id
                WHERE CAST(len(list_filter(range(1, 17),
                  i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 16 >= 0.5),
      sym AS (SELECT d1 AS a, d2 AS b FROM pairs
              UNION SELECT d2, d1 FROM pairs),
      deg AS (SELECT a, CAST(count(*) AS BIGINT) AS dd FROM sym GROUP BY 1),
      e AS (SELECT da.dd AS x, db.dd AS y
            FROM sym JOIN deg da ON sym.a = da.a JOIN deg db ON sym.b = db.a),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(x * y) AS BIGINT) AS sxy
            FROM e)
      SELECT m AS n_directed_edges, sx AS sum_deg, sx2 AS sum_deg_sq,
        sxy AS sum_xy,
        CAST(CASE WHEN CAST(m AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx = 0 THEN 0
          ELSE ((CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx) * 1000000)
            // (CAST(m AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx)
          END AS BIGINT) AS assortativity_micro
      FROM m"""))

  /** Conversion latency ([[graft.operators.Events.timeToConvert]]):
    * first view → first purchase strictly after it, exact-integer
    * mean + micro-quantized exact quartiles. */
  val e32: QueryDef = QueryDef(
    "e32_time_to_convert",
    (s, d) => Events.timeToConvert(Tables.events(s, d), "event_type",
      "user_id", "ts", "view", "purchase"),
    Some("""WITH v AS (SELECT user_id, min(ts) AS vts FROM events
               WHERE event_type = 'view' GROUP BY 1),
      p AS (SELECT e.user_id, v.vts, min(e.ts) AS pts
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > v.vts
            GROUP BY e.user_id, v.vts),
      l AS (SELECT epoch_us(pts - vts) // 1000000 AS lat_s FROM p)
      SELECT CAST(count(*) AS BIGINT) AS n_converters,
        CAST(CASE WHEN count(*) = 0 THEN 0
          ELSE COALESCE(sum(lat_s), 0) // count(*) END AS BIGINT) AS mean_s,
        CAST(round(quantile_cont(lat_s, 0.25) * 1000000) AS BIGINT) AS p25_s_micro,
        CAST(round(quantile_cont(lat_s, 0.5) * 1000000) AS BIGINT) AS p50_s_micro,
        CAST(round(quantile_cont(lat_s, 0.75) * 1000000) AS BIGINT) AS p75_s_micro
      FROM l"""))

  /** Stratified deterministic sampling audit
    * ([[graft.operators.Curate.stratifiedHashSample]]): English at
    * 500‰, everything else at 250‰, fate a pure function of
    * (salt, doc_id) — reproducible, join-stable, RNG-free. */
  val p36: QueryDef = QueryDef(
    "p36_stratified_sample",
    (s, d) => Curate.stratifiedHashSample(Tables.documents(s, d), "doc_id",
      "lang", "graft", Map("en" -> 500), 250),
    Some(s"""WITH b AS (SELECT lang,
               CASE WHEN lang = 'en' THEN 500 ELSE 250 END AS tp,
               (((${DuckOps.strHash60("('graft:' || CAST(doc_id AS VARCHAR))")} % 2147483648)
                 * 2654435761) % 2147483648) % 1000 AS bucket
             FROM documents)
      SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(tp AS BIGINT) AS target_permille,
        CAST(COALESCE(sum(CASE WHEN bucket < tp THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS n_sampled,
        CAST((CAST(COALESCE(sum(CASE WHEN bucket < tp THEN 1 ELSE 0 END), 0) AS HUGEINT)
          * 1000000) // count(*) AS BIGINT) AS realized_micro
      FROM b GROUP BY 1, 3 ORDER BY 1"""))
}
