package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextOps}

/** Round-9 additions, part 3: corpus-preparation operators between
  * dedup and tokenization — asymmetric containment dedup (the
  * doc-inside-doc signal Jaccard misses), temperature-scaled source
  * mixing (the multilingual alpha-sampling rule), and overlapping
  * token-window chunking (the context-window extraction step that
  * feeds sequence packing).
  */
object Pipeline8 {

  def all: Seq[QueryDef] = Seq(d08, p16, p17, t18)

  /** floor(x * 1e6 / y) in pure BIGINT via long-division
    * decomposition (the p02 idiom): exact up to ~9e15, where a naive
    * x*1000000 overflows at ~9e12 — a 100 TB corpus is ~2.5e13
    * tokens. Floor-division semantics match across engines for the
    * non-negative operands used here. */
  private def microDiv(x: String, y: String): String =
    s"($x div $y) * 1000000 + (($x % $y) * 1000 div $y) * 1000 + " +
      s"((($x % $y) * 1000 % $y) * 1000 div $y)"

  /** Asymmetric shingle-containment pairs
    * ([[graft.operators.Dedup.containmentPairs]]): shared distinct
    * 3-gram hashes / min(set sizes) >= 0.6, doc-frequency cap 64.
    * Catches near-verbatim INCLUSION (a short doc embedded in a long
    * one) that d02's symmetric Jaccard scores near zero. Shares
    * d02's audited candidate machinery — one capped-collect
    * aggregation pass, bounded per-shingle fan-out — so the 100 TB
    * bounds are identical; only the final metric differs. */
  val d08: QueryDef = QueryDef(
    "d08_containment_pairs",
    (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "text", 3, 0.6, maxDocFreq = 64)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hsets AS (SELECT doc_id,
          list_distinct(list_transform(s, x -> ${DuckOps.strHash60("x")})) AS hs FROM sh),
      e AS (SELECT doc_id, unnest(hs) AS sgl FROM hsets),
      hot AS (SELECT sgl FROM e GROUP BY sgl HAVING count(*) > 64),
      kept AS (SELECT doc_id, sgl FROM e ANTI JOIN hot USING (sgl)),
      sz AS (SELECT doc_id, len(hs) AS n FROM hsets),
      pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
                FROM kept a JOIN kept b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT d1, d2, shared, CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
        CAST(shared AS DOUBLE) / CAST(least(s1.n, s2.n) AS DOUBLE) AS containment
      FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      WHERE CAST(shared AS DOUBLE) / CAST(least(s1.n, s2.n) AS DOUBLE) >= 0.6
      ORDER BY d1, d2"""))

  /** Temperature-scaled source mixing (alpha = 0.5): sampling share
    * q_i proportional to p_i^alpha — the standard multilingual /
    * multi-source rebalancing rule (upsample the tail, downsample the
    * head). All shares are exact-integer micro units: the per-source
    * sqrt is ONE correctly-rounded IEEE op micro-quantized
    * immediately, so the cross-source sums are exact BIGINT sums and
    * the result hashes identically in both engines. 100 TB shape:
    * one partial-agg shuffle to O(sources) rows, then a broadcast
    * cross join with the 1-row totals — the corpus is touched once;
    * the boost column (q/p) is what a sampler multiplies per-doc
    * selection probabilities by downstream. */
  val p16: QueryDef = QueryDef(
    "p16_temperature_mix",
    (s, d) => {
      val per = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .selectExpr("source", "n_docs",
          "cast(round(sqrt(cast(n_docs as double)) * 1000000) as bigint) AS s_micro")
      val tot = per.agg(sum(col("n_docs")).as("n_total"),
        sum(col("s_micro")).as("s_total"))
      per.crossJoin(broadcast(tot))
        .selectExpr("source", "n_docs",
          s"${microDiv("n_docs", "n_total")} AS p_micro",
          s"${microDiv("s_micro", "s_total")} AS q_micro")
        .selectExpr("source", "n_docs", "p_micro", "q_micro",
          "if(p_micro = 0, 0, (q_micro * 1000000) div p_micro) AS boost_micro")
        .orderBy(col("source"))
    },
    Some("""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(sqrt(count(*)::DOUBLE) * 1000000) AS BIGINT) AS s_micro
             FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                     CAST(sum(s_micro) AS BIGINT) AS s_total FROM per),
      m AS (SELECT source, n_docs,
              (n_docs // n_total) * 1000000 + ((n_docs % n_total) * 1000 // n_total) * 1000 +
                (((n_docs % n_total) * 1000 % n_total) * 1000 // n_total) AS p_micro,
              (s_micro // s_total) * 1000000 + ((s_micro % s_total) * 1000 // s_total) * 1000 +
                (((s_micro % s_total) * 1000 % s_total) * 1000 // s_total) AS q_micro
            FROM per, tot)
      SELECT source, n_docs, p_micro, q_micro,
        CASE WHEN p_micro = 0 THEN 0 ELSE (q_micro * 1000000) // p_micro END AS boost_micro
      FROM m ORDER BY source"""))

  /** HTML boilerplate shell wrapped around each doc's text,
    * byte-identical in both engines: a scripted head (whose content —
    * including a raw `<` and an entity — must vanish WITH the block),
    * a styled block, a comment carrying the doc_id, and a paragraph
    * with every decoded entity incl. the `&amp;lt;` double-decode
    * trap. The corpus text rides inside a nested div. */
  private val htmlHead =
    "<html><head><script type=\"text/javascript\">if (1 < 2) { emit(\"&amp;\"); }" +
      "</script><style>p > em { color: \"red\"; }</style></head><body><!-- doc "
  private val htmlMid =
    " --><h1 class=\"t\">"
  private val htmlEnt =
    "</h1><p>a &amp;amp; b &lt;raw&gt; &quot;"
  private val htmlTail =
    "&quot; it&#39;s&nbsp;fine</p><div><p>"
  private val htmlEnd = "</p><br/></div></body></html>"

  /** HTML → text extraction ([[graft.operators.TextOps.stripHtml]]):
    * drop script/style/comment blocks with their content, strip tags,
    * decode entities (`&amp;` last — the double-decode trap is a
    * pinned test), collapse whitespace. The query wraps each doc in a
    * deterministic adversarial HTML shell IN BOTH ENGINES, so the
    * stripper is proven on markup even though the corpus is plain
    * text. 100 TB shape: pure projection, ZERO shuffle (the orderBy
    * is presentation-only). */
  val t18: QueryDef = QueryDef(
    "t18_html_strip",
    (s, d) => TextOps.stripHtml(
      Tables.documents(s, d).selectExpr("doc_id",
        s"concat('${sqlQ(htmlHead)}', cast(doc_id as string), '${sqlQ(htmlMid)}', source, " +
          s"'${sqlQ(htmlEnt)}', lang, '${sqlQ(htmlTail)}', text, '${sqlQ(htmlEnd)}') AS html"),
      "html").orderBy(col("doc_id")),
    Some(s"""WITH h AS (SELECT doc_id,
        '${duckQ(htmlHead)}' || CAST(doc_id AS VARCHAR) || '${duckQ(htmlMid)}' || source ||
        '${duckQ(htmlEnt)}' || lang || '${duckQ(htmlTail)}' || text || '${duckQ(htmlEnd)}' AS html
      FROM documents),
      s1 AS (SELECT doc_id,
        CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
        CAST(len(regexp_extract_all(html, '&(?:lt|gt|quot|#39|nbsp|amp);')) AS BIGINT) AS n_entities,
        regexp_replace(regexp_replace(regexp_replace(html,
          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
          '(?s)<!--.*?-->', ' ', 'g') AS nb
      FROM h),
      s2 AS (SELECT doc_id, n_tags, n_entities,
        regexp_replace(nb, '<[^>]*>', ' ', 'g') AS nt FROM s1)
      SELECT doc_id, n_tags, n_entities,
        trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(nt,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
          '[ \\t\\r\\n]+', ' ', 'g')) AS clean_text
      FROM s2 ORDER BY doc_id"""))

  /** Spark-SQL single-quoted literal escaping for the shell strings. */
  private def sqlQ(x: String): String = x.replace("\\", "\\\\").replace("'", "\\'")
  /** DuckDB single-quoted literal escaping. */
  private def duckQ(x: String): String = x.replace("'", "''")

  /** Overlapping token-window chunking (window 32, stride 24): every
    * document becomes ceil(n/stride) context windows of <= 32 tokens
    * with 8-token overlap — the extraction step that turns documents
    * into training sequences (p03/p13 pack the RESULTING chunks).
    * 100 TB shape: pure projection + generator explode, ZERO shuffle
    * (the orderBy is presentation-only); output size is bounded by
    * (1 + overlap/stride) x corpus tokens. Each chunk carries its
    * token span and a 60-bit content fingerprint so downstream exact
    * dedup can run at chunk granularity. */
  val p17: QueryDef = QueryDef(
    "p17_chunk_windows",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
      .selectExpr("doc_id", "t", "size(t) AS n")
      .filter(col("n") > 0)
      .selectExpr("doc_id", "n", "t", "explode(sequence(1, n, 24)) AS start_tok")
      .selectExpr("doc_id",
        "cast((start_tok - 1) div 24 as bigint) AS chunk_id",
        "cast(start_tok as bigint) AS start_tok",
        "cast(size(slice(t, start_tok, 32)) as bigint) AS n_tok",
        s"${TextOps.strHash60("concat_ws(' ', slice(t, start_tok, 32))")} AS chunk_fp")
      .orderBy(col("doc_id"), col("chunk_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      g AS (SELECT doc_id, t, len(t) AS n FROM tk WHERE len(t) > 0),
      e AS (SELECT doc_id, n, t, unnest(range(1, n + 1, 24)) AS start_tok FROM g),
      c AS (SELECT doc_id,
              CAST((start_tok - 1) // 24 AS BIGINT) AS chunk_id,
              CAST(start_tok AS BIGINT) AS start_tok,
              CAST(len(t[start_tok : start_tok + 31]) AS BIGINT) AS n_tok,
              array_to_string(t[start_tok : start_tok + 31], ' ') AS cs
            FROM e)
      SELECT doc_id, chunk_id, start_tok, n_tok,
        ${DuckOps.strHash60("cs")} AS chunk_fp
      FROM c ORDER BY doc_id, chunk_id"""))
}
