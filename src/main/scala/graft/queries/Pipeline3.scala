package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cluster, Dedup, Similarity, TextOps}

/** Round-5 LLM-pipeline additions: the remaining curation steps a
  * training-data pipeline runs between pair generation and shard
  * write-out — near-dup CLUSTERING (pairs → components → groups), PII
  * redaction, per-domain caps, and inverse-document-frequency term
  * ranking. Exact-integer / exact-regex throughout so the DuckDB
  * oracles stay cell-exact.
  */
object Pipeline3 {

  def all: Seq[QueryDef] = Seq(c01, t09, p09, t10, s06)

  /** One k-means (Lloyd) centroid-update step over the s04 IVF
    * partition ([[graft.operators.Similarity.kmeansUpdate]]): per
    * (centroid, dimension), member count and the exact-integer mean
    * of micro-quantized coordinates — the embedding-clustering
    * refinement an IVF index build runs. The oracle replays the
    * broadcast-argmax assignment (same fold order, same (cos DESC,
    * cid) tie-break as s04) and the micro-unit mean; DuckDB's `//`
    * floors while Spark's `div` truncates, so the oracle decomposes
    * the division by sign. */
  val s06: QueryDef = QueryDef(
    "s06_kmeans_update",
    (s, d) => Similarity.kmeansUpdate(Tables.embeddings(s, d), 16)
      .orderBy(col("centroid"), col("dim")),
    Some(s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      nn AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM nn WHERE vec_id < 16),
      sc AS (SELECT vec_id, v, cid,
               ${DuckOps.dot("v", "cv")} / (sqrt(nrm) * sqrt(cn)) AS cos
             FROM nn, c),
      asg AS (SELECT vec_id, v, cid FROM (
               SELECT vec_id, v, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
               -- NaN cosines never assign (zero-norm vectors are
               -- unassignable and excluded from every cluster mean)
               FROM sc WHERE NOT isnan(cos)) WHERE rk = 1),
      x AS (SELECT cid AS centroid,
              unnest(range(1, len(v) + 1)) AS dim,
              unnest(list_transform(range(1, len(v) + 1),
                i -> CAST(round(v[i] * 1000000) AS BIGINT))) AS xm
            FROM asg),
      g AS (SELECT centroid, dim, count(*) AS n_members, sum(xm) AS s
            FROM x GROUP BY 1, 2)
      SELECT CAST(centroid AS BIGINT) AS centroid, CAST(dim AS BIGINT) AS dim,
        CAST(n_members AS BIGINT) AS n_members,
        CAST(CASE WHEN s < 0 THEN -((-s) // n_members)
             ELSE s // n_members END AS BIGINT) AS mean_micro
      FROM g ORDER BY centroid, dim"""))

  /** Near-dup cluster assignment: MinHash-LSH pairs (d03's generator)
    * contracted to connected components
    * ([[graft.operators.Cluster.connectedComponents]] — min-label
    * propagation + pointer-jumping, O(log diameter) distributed
    * rounds), then every corpus doc labeled with its component's
    * minimum doc_id (singletons label themselves via the left-join
    * coalesce) and its cluster size. This is the step d05's pairwise
    * keep-first policy approximates: with components, "keep one per
    * CLUSTER" is exact even when dup chains a-b, b-c never compared
    * a-c directly. The oracle replays min-over-reachable-set with a
    * recursive transitive-closure CTE over the same symmetric edges.
    */
  val c01: QueryDef = QueryDef(
    "c01_dedup_clusters",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"))
      val labels = Cluster.connectedComponents(pairs, "d1", "d2")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .selectExpr("doc_id", "cast(coalesce(lbl, doc_id) as bigint) AS cluster_id")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))).cast("long"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
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
      e2 AS (SELECT d1 AS a, d2 AS b FROM pairs
             UNION SELECT d2, d1 FROM pairs),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
                UNION
                SELECT e2.b AS id, reach.r FROM reach JOIN e2 ON e2.a = reach.id),
      lbl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
      SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
        CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
      FROM lbl ORDER BY doc_id"""))

  // shared no-capture-group patterns — identical leftmost/greedy
  // semantics in Java regex (Spark) and RE2 (DuckDB); applied to
  // lower(text) so case handling is explicit, counted BEFORE
  // redaction, redacted in a fixed email -> ipv4 -> phone order
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  // octets restricted to 0-255 (no leading zeros): \d{1,3} accepted
  // 999.999.999.999 and dotted version numbers. Alternation order
  // (longest first) gives the same leftmost-first result under Java
  // backtracking and RE2's priority NFA; groups are non-capturing so
  // group-0 counts and replacement stay whole-match in both engines
  private val Octet = "(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
  private val Ipv4Re = s"\\b$Octet(?:\\.$Octet){3}\\b"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII redaction: count and scrub emails / IPv4 addresses / phone
    * numbers — the compliance pass every public-crawl corpus runs
    * before training. 100 TB shape: pure per-row projection, zero
    * shuffle; the regexes are anchored-free scans, no backtracking
    * blowup (no nested quantifiers). Counts use group-0 extraction so
    * both engines count whole matches. */
  val t09: QueryDef = QueryDef(
    "t09_pii_redact",
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(lower(col("text")), lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ipv4"),
        size(regexp_extract_all(lower(col("text")), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(col("text")), EmailRe, "<email>"),
            Ipv4Re, "<ip>"),
          PhoneRe, "<phone>").as("text_redacted"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text), '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(lower(text), '$Ipv4Re')) AS BIGINT) AS n_ipv4,
        CAST(len(regexp_extract_all(lower(text), '$PhoneRe')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(regexp_replace(lower(text),
          '$EmailRe', '<email>', 'g'), '$Ipv4Re', '<ip>', 'g'),
          '$PhoneRe', '<phone>', 'g') AS text_redacted
      FROM documents ORDER BY doc_id"""))

  /** Per-domain cap (domain balancing): keep at most 50 docs per
    * source, deterministic first-by-doc_id policy — the anti-spam /
    * anti-monoculture step that stops one crawl domain from dominating
    * the mix. 100 TB shape: ONE shuffle (window partitioned by
    * source); heavily skewed domains sort independently per partition
    * and the filter drops rows streamingly — no per-group
    * materialization. */
  val p09: QueryDef = QueryDef(
    "p09_domain_cap",
    (s, d) => Tables.documents(s, d)
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
      .filter(col("rk") <= 50)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source,
        CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rk
      FROM documents QUALIFY rk <= 50 ORDER BY doc_id"""))

  /** Top-3 characteristic terms per source by exact-integer
    * inverse-document-frequency weighting: score = tf * ((n_docs *
    * 1e6) div df) — the log-free idf variant so the score stays a
    * deterministic BIGINT (ln() is not bit-stable across engines).
    * 100 TB shape: tf and df are both map-side-combined groupBys over
    * the exploded token stream; the df table joins tf on the token
    * hash (equi-join); the final window ranks only |sources| * |vocab
    * per source| rows, and n_docs is a broadcast 1-row cross join.
    * (At >= ~1e13 doc corpora the n_docs * 1e6 product needs p02's
    * long-division decomposition; plain products hold to ~9e18.) */
  val t10: QueryDef = QueryDef(
    "t10_tfidf_terms",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.selectExpr("doc_id", "source",
        s"explode(${TextOps.tokens("text")}) AS token")
      val dfTbl = tok.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val tfTbl = tok.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      tfTbl.join(dfTbl, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .selectExpr("source", "token", "tf", "df",
          "tf * ((n_docs * 1000000) div df) AS score_micro")
        .withColumn("rk",
          row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("score_micro").desc, col("token"))).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("source"), col("rk"), col("token"), col("tf"),
          col("df"), col("score_micro"))
        .orderBy(col("source"), col("rk"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, source,
          unnest(${DuckOps.tokens("text")}) AS token FROM documents),
      dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
      tfx AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT source, token, tf, df,
               tf * ((n_docs * 1000000) // df) AS score_micro,
               row_number() OVER (PARTITION BY source
                 ORDER BY tf * ((n_docs * 1000000) // df) DESC, token) AS rk
             FROM tfx JOIN dfx USING (token), n)
      SELECT source, CAST(rk AS BIGINT) AS rk, token, tf, df, score_micro
      FROM sc WHERE rk <= 3 ORDER BY source, rk"""))
}
