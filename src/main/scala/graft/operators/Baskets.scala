package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining over (basket, item) rows — the
  * association-rule layer (support / confidence / lift, the classic
  * Agrawal–Srikant measures, public method) and the co-purchase graph
  * it induces (consumed by [[Graph.triangleCounts]] / [[Graph.kCore]]
  * for community structure).
  *
  * Determinism contract: all three measures are exact BIGINT
  * arithmetic in micro units. `support = n_ab·1e6 div N`,
  * `confidence = n_ab·1e6 div n_a`, and lift is the floor-composed
  * surrogate `(conf_ab_micro · N) div n_b` — two nested floor
  * divisions instead of the textbook single rational, so every
  * intermediate stays below `1e6·N` (safe for N < 9.2e12 baskets;
  * `require`d) and both engines replay the identical op sequence.
  *
  * 100 TB shape: ONE distinct projection of the basket-item log, one
  * basket-keyed collect into the bounded per-basket array with the
  * pair fan-out exploded from it (fan-out bounded by the square of
  * the basket size — baskets are small by nature; a degenerate
  * mega-basket would surface in [[Profile]] first, and holds the same
  * bound a self equi-join would), one pair-keyed partial agg, and two
  * item-keyed equi-joins against the O(catalog) item-count frame
  * (broadcast when the catalog fits, AQE otherwise). The basket count
  * is one O(1)-row aggregate. No driver state beyond that scalar.
  */
object Baskets {

  /** Item pairs co-occurring in at least `minPairs` baskets, with
    * exact-integer association measures. Pairs are emitted once in
    * canonical order (`item_a < item_b`) with both rule directions'
    * confidence.
    *
    * EAGER (the [[Storage.withCached]] contract): the distinct
    * basket-item projection is scanned three ways (both self-join
    * sides + item counts) — it is cached for the build and the result
    * comes back materialized; call [[Storage.release]] after the
    * terminal action. */
  def assocPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long): DataFrame = {
    require(minPairs >= 1L, s"minPairs must be >= 1, got $minPairs")
    val itemsRaw = baskets
      .selectExpr(s"$basketCol AS bk", s"$itemCol AS it")
      .distinct()
    Storage.withCached(itemsRaw) { items =>
      val nBaskets = items.agg(countDistinct(col("bk"))).head.getLong(0)
      require(nBaskets >= 1L, "assocPairs needs at least one basket")
      require(BigInt(1000000L) * BigInt(nBaskets) < BigInt(Long.MaxValue),
        s"assocPairs exact-integer contract: 1e6 * nBaskets($nBaskets) must stay " +
          "below 2^63")
      assocPairsFrom(items, nBaskets, minPairs)
    }
  }

  /** the LAZY [[assocPairs]] plan over an already-available distinct
    * (bk, it) frame — package-private so PlanAuditSpec can audit the
    * un-checkpointed join shape (the rankStep convention). */
  private[graft] def assocPairsFrom(items: DataFrame, nBaskets: Long,
      minPairs: Long): DataFrame = {
    val cnt = items.groupBy(col("it")).agg(count(lit(1)).as("n_it"))
    // pair generation: collect each basket's (distinct) items once and
    // fan pairs out from the bounded array — ONE basket-keyed shuffle
    // instead of the self equi-join's two (re-planned, VERDICT r11
    // #6; measured −30% on q63 at sf0.1). Same fan-out bound as the
    // join form (basket size², baskets are small by nature); ordered
    // pairs come from the sorted array, so item_a < item_b holds by
    // construction
    val pairs = items
      .groupBy(col("bk"))
      .agg(sort_array(collect_list(col("it"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .selectExpr("explode(flatten(transform(sequence(1, size(ds) - 1), " +
        "i -> transform(sequence(i + 1, size(ds)), " +
        "j -> struct(element_at(ds, i) AS item_a, element_at(ds, j) AS item_b))))) AS pr")
      .select(col("pr.item_a"), col("pr.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(cnt.select(col("it").as("item_a"), col("n_it").as("n_a")), Seq("item_a"))
      .join(cnt.select(col("it").as("item_b"), col("n_it").as("n_b")), Seq("item_b"))
      .selectExpr("item_a", "item_b", "n_ab", "n_a", "n_b",
        s"(n_ab * 1000000) div ${nBaskets}L AS support_micro",
        "(n_ab * 1000000) div n_a AS conf_ab_micro",
        "(n_ab * 1000000) div n_b AS conf_ba_micro",
        s"(((n_ab * 1000000) div n_a) * ${nBaskets}L) div n_b AS lift_micro")
  }
}
