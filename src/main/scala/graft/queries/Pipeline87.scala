package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 52: image horizontal gradient energy
  * through the real PPM decoder.
  */
object Pipeline87 {

  def all: Seq[QueryDef] = Seq(m18)

  /** Gradient energy ([[graft.operators.Multimodal.gradientEnergy]])
    * over the canonical deterministic media table: per image and
    * channel, the summed |horizontal neighbor difference| — the
    * sharpness/texture gate. The engine decodes REAL PPM bytes; the
    * oracle replays the pixel generator analytically, keeping only
    * byte pairs whose pixel sits left of its row's last column. */
  val m18: QueryDef = QueryDef(
    "m18_gradient_energy",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.gradientEnergy(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .toDF().orderBy(col("media_id"))
    },
    Some("""WITH px AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
               CAST(4 + doc_id % 29 AS BIGINT) AS w,
               CAST((doc_id * 31 + i * 7) % 256 AS BIGINT) AS v,
               CAST((doc_id * 31 + (i + 3) * 7) % 256 AS BIGINT) AS vn
             FROM documents,
               unnest(range(0, 3 * (4 + doc_id % 29) * (4 + doc_id % 23))) AS t(i)
             WHERE doc_id % 3 = 0),
      d AS (SELECT doc_id, i % 3 AS ch, abs(vn - v) AS dv
            FROM px WHERE ((i // 3) % w) < w - 1),
      a AS (SELECT doc_id,
              CAST(COALESCE(sum(CASE WHEN ch = 0 THEN dv END), 0) AS BIGINT) AS grad_r,
              CAST(COALESCE(sum(CASE WHEN ch = 1 THEN dv END), 0) AS BIGINT) AS grad_g,
              CAST(COALESCE(sum(CASE WHEN ch = 2 THEN dv END), 0) AS BIGINT) AS grad_b
            FROM d GROUP BY 1)
      SELECT doc_id AS media_id,
        CAST(4 + doc_id % 29 AS BIGINT) AS width,
        CAST(4 + doc_id % 23 AS BIGINT) AS height,
        grad_r, grad_g, grad_b
      FROM a ORDER BY 1"""))
}
