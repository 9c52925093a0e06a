package graft.queries

import org.apache.spark.sql.functions.col
import graft.Tables
import graft.operators.{Curate, Dedup}

/** Round-15 additions, part 94: asymmetric source-containment
  * estimates (the re-crawl detector d38's symmetric Jaccard cannot
  * express) and the waterfill ACT face (realize the p57 allocation by
  * selecting docs).
  */
object Pipeline105 {

  def all: Seq[QueryDef] = Seq(d39, p61)

  /** Union-MinHash(32) 3-gram containment estimates for every source
    * pair, plus each source's exact distinct shingle count. The
    * containment expression `m·(n1+n2)·1e6 div ((k+m)·n·)` is exact
    * integer arithmetic on both engines. */
  val d39: QueryDef = QueryDef(
    "d39_source_containment",
    (s, d) => Dedup.sourceContainmentSketch(Tables.documents(s, d),
      "text", 3, 32),
    Some(s"""WITH toks AS (SELECT source, doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT source, doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT source, doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT source, ${DuckOps.minhashSig("h", 32)} AS sig FROM hs),
      slot AS (SELECT source, i, min(sig[i]) AS v
               FROM sig, unnest(range(1, 33)) AS t(i) GROUP BY 1, 2),
      ssig AS (SELECT source, list(v ORDER BY i) AS sig FROM slot GROUP BY 1),
      nsz AS (SELECT source, CAST(count(DISTINCT sgl) AS BIGINT) AS nsz
              FROM (SELECT source, unnest(h) AS sgl FROM hs) GROUP BY 1),
      sized AS (SELECT ssig.source, sig, nsz FROM ssig JOIN nsz USING (source)),
      pairs AS (SELECT a.source AS s1, b.source AS s2,
          CAST(len(list_filter(range(1, 33),
            i -> a.sig[i] = b.sig[i])) AS BIGINT) AS matches,
          a.nsz AS n1, b.nsz AS n2
        FROM sized a JOIN sized b ON a.source < b.source)
      SELECT s1, s2, matches, n1, n2,
        CAST((CAST(matches AS HUGEINT) * (n1 + n2) * 1000000)
          // ((32 + CAST(matches AS HUGEINT)) * n1) AS BIGINT)
          AS cont_1in2_micro,
        CAST((CAST(matches AS HUGEINT) * (n1 + n2) * 1000000)
          // ((32 + CAST(matches AS HUGEINT)) * n2) AS BIGINT)
          AS cont_2in1_micro
      FROM pairs ORDER BY s1, s2"""))

  /** Realize p57's 40%-of-corpus uniform-weight waterfill plan by
    * selecting docs per source in salted-hash order until each
    * source's allocation is exhausted. Oracle nests the full p57
    * planning chain and replays the selection window. */
  val p61: QueryDef = QueryDef(
    "p61_waterfill_select",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val total = docs.selectExpr(
        "sum(cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint)) AS t")
        .head.getLong(0)
      Curate.waterfillSelect(docs, "doc_id", "source", "text",
        2L * total / 5L, salt = "wf")
        .orderBy(col("id"))
    },
    Some(s"""WITH plan AS (${Pipeline97.p57.oracle.get}),
      toks AS (SELECT doc_id AS id, source,
          CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
            x -> x <> '')) AS BIGINT) AS n_tokens,
          ${DuckOps.strHash60("concat('wf', ':', CAST(doc_id AS VARCHAR))")}
            AS hkey
        FROM documents),
      cum AS (SELECT id, source, n_tokens,
          CAST(sum(n_tokens) OVER (PARTITION BY source
            ORDER BY hkey, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM toks)
      SELECT c.id, c.source, c.n_tokens, c.cum_tokens, p.alloc_tokens
      FROM cum c JOIN plan p ON c.source = p.source
      WHERE c.cum_tokens <= p.alloc_tokens
      ORDER BY c.id"""))
}
