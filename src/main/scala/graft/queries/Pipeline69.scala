package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, TextOps}

/** Round-11 additions, part 34: the annealed mixture schedule made
  * EXECUTABLE — p43's per-epoch weights driving the deterministic
  * hash sampler, so the schedule is a sampling plan, not a table.
  */
object Pipeline69 {

  def all: Seq[QueryDef] = Seq(p44)

  /** Realized annealed sampling: each (epoch, source) target from
    * [[graft.operators.Curate.annealedMixture]] becomes a per-mille
    * rate (`weight_micro div 1000`), and every doc is kept in epoch
    * e iff its salted hash bucket (`strHash60('anneal:e:doc_id')`,
    * the p34/p36-proven cross-engine scramble) lands under the rate
    * — deterministic, replayable, seed-free. Output per (epoch,
    * source): target rate, doc counts, and the realized micro
    * fraction, so schedule-vs-realization drift is a number, not a
    * hope. The oracle nests p43's schedule chain and replays the
    * identical hash.
    *
    * 100 TB shape: the S×E schedule grid broadcasts onto one
    * corpus pass (map-only hash + compare), then one
    * (epoch, source)-keyed partial agg. */
  val p44: QueryDef = QueryDef(
    "p44_annealed_realized",
    (s, d) => {
      val sched = Curate.annealedMixture(Tables.documents(s, d),
          "source", "text", 4)
        .selectExpr("epoch", "source", "weight_micro div 1000 AS target_permille")
      val h = TextOps.strHash60(
        "concat('anneal', ':', cast(epoch as string), ':', cast(doc_id as string))")
      Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(broadcast(sched), Seq("source"))
        .selectExpr("epoch", "source", "target_permille",
          s"cast(((($h % 2147483648L) * 2654435761L) % 2147483648L) % 1000" +
            " < target_permille as bigint) AS sampled")
        .groupBy(col("epoch"), col("source"), col("target_permille"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("sampled")), lit(0L)).as("n_sampled"))
        .selectExpr("epoch", "source", "target_permille", "n_docs", "n_sampled",
          "cast((cast(n_sampled as decimal(38,0)) * 1000000) div n_docs as bigint)" +
            " AS realized_micro")
        .orderBy(col("epoch"), col("source"))
    },
    Some(s"""WITH per AS (SELECT source,
               CAST(sum(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> ''))) AS BIGINT) AS w
             FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_sources FROM per),
      base AS (SELECT source,
                 CAST(CAST(w AS HUGEINT) * 1000000 // total AS BIGINT)
                   AS natural_micro,
                 CAST(1000000 // n_sources AS BIGINT) AS uniform_micro
               FROM per, tot),
      sched AS (SELECT CAST(e AS BIGINT) AS epoch, source,
                  CAST(natural_micro + (uniform_micro - natural_micro) * e // 3
                    AS BIGINT) // 1000 AS target_permille
                FROM base, unnest(range(0, 4)) AS t(e)),
      hit AS (SELECT s.epoch, s.source, s.target_permille,
                CAST(((${DuckOps.strHash60(
                  "('anneal:' || CAST(s.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))")}
                  % 2147483648) * 2654435761) % 2147483648 % 1000
                  < s.target_permille AS BIGINT) AS sampled
              FROM documents d JOIN sched s ON d.source = s.source)
      SELECT epoch, source, target_permille,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(COALESCE(sum(sampled), 0) AS BIGINT) AS n_sampled,
        CAST((CAST(COALESCE(sum(sampled), 0) AS HUGEINT) * 1000000)
          // count(*) AS BIGINT) AS realized_micro
      FROM hit GROUP BY 1, 2, 3 ORDER BY epoch, source"""))
}
