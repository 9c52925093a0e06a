package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Baskets, Dedup, TextOps}

/** Round-11 additions, part 2: the three BENCH_SCALE findings
  * operationalized as first-class queries — the pre-flight audits and
  * scale-correct variants a deployment runs BEFORE pointing the
  * engine at a 100 TB corpus.
  */
object Pipeline37 {

  def all: Seq[QueryDef] = Seq(d20, t36, q63)

  /** Candidate-cap saturation audit (BENCH_SCALE finding 2 as a
    * query): for each candidate-generation df cap (16 / 64 / 256),
    * how many distinct 3-shingles exceed it and — the number that
    * actually decides recall — what micro share of the POSTINGS MASS
    * their occurrences carry. Hot-share ≈ 1e6 means the corpus is
    * df-saturated: capped inverted-index pair generation (d02/d08/
    * d09) would prune nearly all candidates, and dedup must ride the
    * signature paths (d01/d03/d04) instead. The pre-flight check the
    * 10× scale sweep showed is load-bearing.
    *
    * 100 TB shape: one shingle-hash df partial agg (the d02 frame),
    * a 3-row cap explode over the tiny (shingle, df) table, one cap-
    * keyed fold. */
  val d20: QueryDef = QueryDef(
    "d20_cap_saturation",
    (s, d) => {
      val df = Dedup.shingleHashSets(Tables.documents(s, d), "text", 3)
        .selectExpr("doc_id", "explode_outer(hs) AS g")
        .filter(col("g").isNotNull)
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
      df.selectExpr("df", "explode(array(16L, 64L, 256L)) AS cap")
        .groupBy(col("cap"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(expr("if(df > cap, 1L, 0L)")).as("n_hot"),
          sum(col("df")).as("postings"),
          sum(expr("if(df > cap, df, 0L)")).as("hot_postings"))
        .selectExpr("cap", "n_shingles", "n_hot", "postings", "hot_postings",
          "cast((cast(hot_postings as decimal(38,0)) * 1000000) div postings" +
            " as bigint) AS hot_share_micro")
        .orderBy(col("cap"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      e AS (SELECT doc_id, unnest(list_distinct(
              list_transform(s, x -> ${DuckOps.strHash60("x")}))) AS g FROM sh),
      dfx AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY 1),
      caps AS (SELECT unnest([16, 64, 256]) AS cap),
      a AS (SELECT CAST(cap AS BIGINT) AS cap,
              CAST(count(*) AS BIGINT) AS n_shingles,
              CAST(sum(CASE WHEN df > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
              CAST(sum(df) AS BIGINT) AS postings,
              CAST(sum(CASE WHEN df > cap THEN df ELSE 0 END) AS BIGINT)
                AS hot_postings
            FROM dfx, caps GROUP BY 1)
      SELECT cap, n_shingles, n_hot, postings, hot_postings,
        CAST((CAST(hot_postings AS HUGEINT) * 1000000) // postings AS BIGINT)
          AS hot_share_micro
      FROM a ORDER BY cap"""))

  /** Stopword / postings-mass profile (BENCH_SCALE finding 1's cost
    * model as a query): the top-30 unigram terms by document
    * frequency with their occurrence mass, micro share of ALL
    * postings, and the negative-idf stopword flag (`2·df > N` — the
    * exact sign condition of the t19 Padé idf). The audit that tells
    * a retrieval deployment how much scoring mass stopword pruning
    * would shed — 87% on the 10× synthetic slice.
    *
    * 100 TB shape: one tokenize pass into a term-keyed partial agg
    * (occurrences + distinct docs per term), a TakeOrdered top-30
    * head (never a full vocabulary sort), 1-row broadcast totals. */
  val t36: QueryDef = QueryDef(
    "t36_stopword_profile",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val per = docs
        .selectExpr("doc_id", s"explode(${TextOps.tokens("text")}) AS term")
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("df"))
      val tot = per.agg(sum(col("n_occ")).as("occ_total"))
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      val top = per.orderBy(col("df").desc, col("term").asc).limit(30)
      top.crossJoin(broadcast(tot)).crossJoin(broadcast(nd))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("df").desc, col("term").asc)).cast("long"))
        .selectExpr("rank", "term", "df", "n_occ",
          "cast((cast(n_occ as decimal(38,0)) * 1000000) div occ_total" +
            " as bigint) AS occ_share_micro",
          "2 * df > n_docs AS is_stopword")
        .orderBy(col("rank"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, unnest(${DuckOps.tokens("text")}) AS term
               FROM documents),
      per AS (SELECT term, CAST(count(*) AS BIGINT) AS n_occ,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tk GROUP BY 1),
      tot AS (SELECT CAST(sum(n_occ) AS BIGINT) AS occ_total FROM per),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      top AS (SELECT term, df, n_occ FROM per ORDER BY df DESC, term LIMIT 30)
      SELECT CAST(row_number() OVER (ORDER BY df DESC, term) AS BIGINT) AS rank,
        term, df, n_occ,
        CAST((CAST(n_occ AS HUGEINT) * 1000000) // occ_total AS BIGINT)
          AS occ_share_micro,
        2 * df > n_docs AS is_stopword
      FROM top, tot, nd ORDER BY rank"""))

  /** Scale-correct association mining (BENCH_SCALE finding 3 as a
    * query): q42's basket pairs ranked by RELATIVE support with a
    * top-50 cut instead of an absolute pair-count threshold — the
    * output stays output-k-bounded no matter how many baskets the
    * corpus grows (q42's `minPairs = 3` emitted 2 rows at sf0.1 and
    * 1.2M rows on the 10× slice; this emits 50 either way). Pair
    * generation cost is unchanged (bounded by basket size²); only
    * the cut moves from absolute to relative. */
  val q63: QueryDef = QueryDef(
    "q63_assoc_top_support",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // compose the LAZY pair builder (re-planned, VERDICT r11 #6):
      // the eager assocPairs checkpoints the FULL pair frame, which a
      // top-50 then throws away — cache only the distinct basket-item
      // projection and let the 50-row result be the materialization
      val itemsRaw = Tables.lineitem(s, d)
        .selectExpr("l_orderkey AS bk", "l_partkey AS it").distinct()
      graft.operators.Storage.withCached(itemsRaw) { items =>
        val nBaskets = items.agg(count_distinct(col("bk"))).head.getLong(0)
        // top-50 BEFORE the per-item count joins (round 16):
        // support_micro needs only nBaskets, so TakeOrdered runs on
        // the bare pair-count frame and the two count joins touch 50
        // rows instead of every pair. Ordering is unchanged — the
        // count joins are 1:1 inner (every pair item exists in the
        // count table), so the former plan ranked the same rows by
        // the same (support_micro, item_a, item_b) key.
        Baskets.withCounts(
            Baskets.pairCounts(items, nBaskets, minPairs = 2L)
              .orderBy(col("support_micro").desc, col("item_a"), col("item_b"))
              .limit(50),
            items, nBaskets)
          .withColumn("rank", row_number().over(Window.orderBy(
            col("support_micro").desc, col("item_a"), col("item_b"))).cast("long"))
          .select(col("rank"), col("item_a"), col("item_b"), col("n_ab"),
            col("support_micro"), col("lift_micro"))
          .orderBy(col("rank"))
      }
    },
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM it),
      cnt AS (SELECT it, CAST(count(*) AS BIGINT) AS n_it FROM it GROUP BY 1),
      pr AS (SELECT a.it AS item_a, b.it AS item_b, CAST(count(*) AS BIGINT) AS n_ab
             FROM it a JOIN it b ON a.bk = b.bk AND a.it < b.it
             GROUP BY 1, 2 HAVING count(*) >= 2),
      m AS (SELECT p.item_a, p.item_b, p.n_ab,
              (p.n_ab * 1000000) // (SELECT n FROM nb) AS support_micro,
              (((p.n_ab * 1000000) // ca.n_it) * (SELECT n FROM nb)) // cb.n_it
                AS lift_micro
            FROM pr p JOIN cnt ca ON p.item_a = ca.it
                      JOIN cnt cb ON p.item_b = cb.it),
      top AS (SELECT * FROM m
              ORDER BY support_micro DESC, item_a, item_b LIMIT 50)
      SELECT CAST(row_number() OVER (ORDER BY support_micro DESC, item_a,
          item_b) AS BIGINT) AS rank,
        item_a, item_b, n_ab, support_micro, lift_micro
      FROM top ORDER BY rank"""))
}
