package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, collect_list, count, expr, lit, max, min, row_number, sort_array, sum}

/** SQL expression builders for the text-pipeline operators (tokenize,
  * shingle, hash, minhash, simhash). Everything is exact integer
  * arithmetic over code points, so Spark and the DuckDB oracle compute
  * bit-identical values — no engine-specific hash functions.
  *
  * All builders return Spark SQL fragments (for `selectExpr`/`expr`);
  * the DuckDB twins live next to each query's oracle. The LLM-pipeline
  * operators (SURVEY §7 M5) build on these.
  */
object TextOps {

  /** Modulus for all polynomial hashes: largest prime < 2^30, so
    * a*h products stay well inside Int64. */
  val P = 1000000007L

  /** lowercase word tokens (runs of [a-z0-9]). */
  def tokens(col: String): String =
    s"filter(split(lower($col), '[^a-z0-9]+'), x -> x != '')"

  /** n-token shingles joined by single spaces; empty array when the
    * doc has fewer than n tokens. `slice(t,1,0)` is the typed empty
    * array (both engines lack an untyped array literal in Spark). */
  def shingles(toksCol: String, n: Int): String =
    s"if(size($toksCol) < $n, slice($toksCol, 1, 0), " +
      s"transform(sequence(1, size($toksCol) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice($toksCol, i, $n))))"

  /** Polynomial rolling hash of a string expression: fold over code
    * points, acc = (acc*mult + cp) % P. Computed by the native
    * codegen'd [[graft.functions.PolyHash]] expression; equals DuckDB's
    * list_reduce(list_transform(range(1, length(e)+1),
    *   j -> ord(substr(e, j, 1))), (a,b) -> (a*mult+b) % P)
    * because folding from the first element == folding from 0. */
  def strHash(e: String, mult: Int = 31): String =
    s"graft_polyhash($e, $mult)"

  /** 60-bit combined hash of a string: two independent polynomial
    * hashes (mults 31/131) packed as h31 * 2^30 + h131 % 2^30. */
  def strHash60(e: String): String =
    s"(${strHash(e, 31)} * 1073741824 + ${strHash(e, 131)} % 1073741824)"

  /** element-wise hash of a string-array column. */
  def hashAll(arrCol: String, mult: Int = 31): String =
    s"transform($arrCol, s -> ${strHash("s", mult)})"

  /** Deterministic per-index affine coefficients for minhash — simple
    * LCG-style mixes, all < P so a*h fits in Int64. The index is cast
    * to BIGINT first: Spark's sequence() yields INT (overflows under
    * ANSI), DuckDB's range() yields BIGINT. */
  def mhA(i: String): String = s"(((cast($i as bigint) + 1) * 1103515245 + 12345) % $P)"
  def mhB(i: String): String = s"(((cast($i as bigint) + 1) * 69069 + 7) % $P)"

  /** k-permutation MinHash signature over a BIGINT-hash array column:
    * sig[i] = min over h of (a_i*h + b_i) % P; sentinel P for empty
    * docs. Pure projection — no shuffle. Backed by the native
    * [[graft.functions.MinHashSig]] expression (same arithmetic as the
    * DuckDB oracle fragment in DuckOps.minhashSig). */
  def minhashSig(hashesCol: String, k: Int): String =
    s"graft_minhash($hashesCol, $k)"

  /** 60-bit SimHash over a BIGINT token-hash array column (hashes must
    * be 60-bit, e.g. [[strHash60]]): bit b set iff the +1/-1 vote over
    * tokens at bit b is positive. Backed by the native
    * [[graft.functions.SimHash60]] expression. */
  def simhash60(hashesCol: String): String =
    s"graft_simhash60($hashesCol)"

  /** Order-insensitive combine of an array of BIGINT minhash values
    * into one band-bucket key (commutative? no — positional fold, and
    * both engines fold left-to-right over the same slice). */
  def foldHash(arrCol: String): String = foldHashWith(arrCol, 1000003L, 7L)

  /** [[foldHash]] with caller-chosen multiplier/seed — the second,
    * independent track a 60-bit fold needs (mod-P folds carry only
    * ~2^30 states; see [[Dialogue.dialogueExactDedup]]'s two-track
    * fingerprint). Multiplier must be < P so acc*mult stays in
    * Int64. */
  def foldHashWith(arrCol: String, mult: Long, seed: Long): String =
    s"aggregate($arrCol, cast($seed as bigint), (acc, x) -> (acc * $mult + x) % $P)"

  /** Common stopword list used by quality scoring & language ID. */
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "zu", "in", "ist", "auf", "mit", "von")
  val StopFr: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "est", "dans", "pour", "avec")
  val StopEs: Seq[String] = Seq("el", "la", "de", "y", "un", "una", "es", "en", "para", "con")

  def arrayLit(xs: Seq[String]): String = xs.mkString("array('", "', '", "')")

  /** count of tokens from `toksCol` present in `stop`. */
  def stopHits(toksCol: String, stop: Seq[String]): String =
    s"size(filter($toksCol, t -> array_contains(${arrayLit(stop)}, t)))"

  /** HTML entity pairs decoded by [[stripHtml]], in application
    * order. `&amp;` MUST decode last: decoding it first would turn
    * the literal text `&amp;lt;` into `&lt;` and then wrongly into
    * `<` (double-decode); decoding the specific entities first cannot
    * match inside `&amp;...` because the raw byte run `&...;` they
    * look for is not present there. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML → text extraction, the crawl pipeline's first stage:
    * drop script/style/comment blocks WITH their content, strip the
    * remaining tags (replaced by a space so adjacent words don't
    * fuse), decode the common entities, collapse whitespace. Every
    * step is a plain string op or a regex with identical Java/RE2
    * semantics (no capture groups, no backrefs — the t09 discipline),
    * so the DuckDB oracle replays it exactly. 100 TB shape: pure
    * projection, ZERO shuffle.
    *
    * Returns `doc_id, n_tags, n_entities, clean_text`. Not a
    * spec-complete HTML5 parser (no CDATA, no conditional comments) —
    * it is the boilerplate-strip a corpus pipeline runs, and malformed
    * markup degrades to extra text, never to an error. */
  def stripHtml(docs: DataFrame, htmlCol: String): DataFrame = {
    val noBlocks =
      s"""regexp_replace(regexp_replace(regexp_replace($htmlCol,
         |  '(?is)<script[^>]*>.*?</script>', ' '),
         |  '(?is)<style[^>]*>.*?</style>', ' '),
         |  '(?s)<!--.*?-->', ' ')""".stripMargin
    val deEnt = HtmlEntities.foldLeft("no_tags") {
      case (acc, (ent, ch)) => s"replace($acc, '$ent', '${ch.replace("'", "\\'")}')"
    }
    docs
      .selectExpr("doc_id",
        s"cast(regexp_count($htmlCol, '<[^>]*>') as bigint) AS n_tags",
        s"cast(regexp_count($htmlCol, '&(?:lt|gt|quot|#39|nbsp|amp);') as bigint) AS n_entities",
        s"$noBlocks AS no_blocks")
      .selectExpr("doc_id", "n_tags", "n_entities",
        "regexp_replace(no_blocks, '<[^>]*>', ' ') AS no_tags")
      .selectExpr("doc_id", "n_tags", "n_entities",
        s"trim(regexp_replace($deEnt, '[ \\t\\r\\n]+', ' ')) AS clean_text")
  }

  /** Per-doc lexical diversity (type/token ratio, hapax ratio) — the
    * vocabulary-richness quality signal. 100 TB shape: pure
    * projection, ZERO shuffle — run-boundary counting over the
    * per-doc sorted token array (position j starts a run iff
    * ts[j] != ts[j-1]; a run is hapax iff the next position starts a
    * new run too), O(len log len) per doc, no exploded-corpus
    * groupBy. The position list is forced to [] when the doc
    * tokenizes empty — Spark's sequence(1, 0) is the DESCENDING
    * [1, 0], whose j = 0 element would throw under ANSI element_at. */
  def lexicalDiversity(docs: DataFrame, textCol: String): DataFrame =
    docs
      .selectExpr("doc_id", s"sort_array(${tokens(textCol)}) AS ts")
      .selectExpr("doc_id", "ts",
        "if(size(ts) = 0, cast(array() as array<int>), sequence(1, size(ts))) AS ps")
      .selectExpr("doc_id",
        "cast(size(ts) as bigint) AS n_tokens",
        "cast(size(filter(ps, j -> " +
          "if(j = 1, true, element_at(ts, j) != element_at(ts, j - 1)))) as bigint) AS n_types",
        "cast(size(filter(ps, j -> " +
          "if(j = 1, true, element_at(ts, j) != element_at(ts, j - 1)) AND " +
          "if(j = size(ts), true, element_at(ts, j + 1) != element_at(ts, j)))) as bigint) AS n_hapax")
      .selectExpr("doc_id", "n_tokens", "n_types", "n_hapax",
        "if(n_tokens = 0, 0, (n_types * 1000000) div n_tokens) AS ttr_micro",
        "if(n_types = 0, 0, (n_hapax * 1000000) div n_types) AS hapax_ratio_micro")

  /** Flesch-style readability in exact integer micro units:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` with
    * two engine-deterministic surrogates — sentences ≈ terminal
    * punctuation RUNS (`[.!?]+`, floored at 1 so headline-style docs
    * score rather than divide by zero) and syllables ≈ vowel GROUPS
    * (`[aeiou]+` runs over the lowercased text; the standard
    * no-dictionary approximation). Both ratio terms are non-negative
    * floor divisions (Spark `div` == DuckDB `//` there); the final
    * subtraction may go negative, which is safe — only division
    * disagrees on negatives across engines. Map-only projection; docs
    * with no tokens are excluded (readability undefined). */
  def readability(docs: DataFrame, textCol: String): DataFrame =
    docs
      .selectExpr("doc_id",
        s"cast(size(${tokens(textCol)}) as bigint) AS n_words",
        s"greatest(1L, cast(size(regexp_extract_all($textCol, '[.!?]+', 0)) as bigint))" +
          " AS n_sentences",
        s"cast(size(regexp_extract_all(lower($textCol), '[aeiou]+', 0)) as bigint)" +
          " AS n_vowel_groups")
      .filter(col("n_words") > 0)
      .selectExpr("doc_id", "n_words", "n_sentences", "n_vowel_groups",
        "206835000L - (1015000L * n_words) div n_sentences" +
          " - (84600000L * n_vowel_groups) div n_words AS flesch_micro")

  /** Per-source domain drift as EXACT total-variation distance
    * between each source's unigram distribution and the corpus
    * distribution: TV = Σ_t |c_st·N − c_t·n_s| / (2·n_s·N), summed
    * as exact integers with ONE final division — no logs, no float
    * accumulation (KL needs ln, whose last-ulp behavior differs
    * across engines; TV is the divergence that stays rational). The
    * domain-shift detector a mixture designer reads next to DSIR
    * weights.
    *
    * 100 TB shape (VERDICT r11 #5): NO sources×vocab grid. Terms
    * absent from source s contribute `c_t·n_s` each, so the absent
    * mass has the closed form `n_s·(N − Σ_{t present in s} c_t)` —
    * the whole TV needs only the PRESENT (source, term) pairs: one
    * term-keyed equi-join of the per-(source,term) counts onto the
    * corpus term counts, one per-source fold, plus the closed-form
    * absent term. The earlier grid form materialized |sources|×|vocab|
    * rows (10¹⁰ at 10³ sources × 10⁷ terms) for pairs that are almost
    * all zero. All products ride decimal(38,0).
    *
    * Returns `source, n_terms_in_source, n_tokens_source, tv_micro`
    * (ordered). */
  def sourceDriftTv(docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val tok = docs.selectExpr(s"$srcCol AS source",
        s"explode(${tokens(textCol)}) AS term")
    val cst = tok.groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"),
      count(lit(1)).as("n_terms_in_source"))
    val ct = cst.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val bigN = ct.agg(sum(col("c_t")).as("n_total"))
    cst.join(ct, Seq("term")) // present pairs only — term-keyed equi-join
      .join(ns, Seq("source")) // n_s inside the per-term sum
      .crossJoin(broadcast(bigN)) // 1-row constant
      .groupBy(col("source"), col("n_terms_in_source"), col("n_s"), col("n_total"))
      .agg(
        sum(expr("abs(cast(c_st as decimal(38,0)) * n_total" +
          " - cast(c_t as decimal(38,0)) * n_s)")).as("num_present"),
        sum(expr("cast(c_t as decimal(38,0))")).as("ct_present"))
      .selectExpr("source", "n_terms_in_source", "n_s AS n_tokens_source",
        // absent terms: each contributes |0 − c_t·n_s| = c_t·n_s, so
        // their sum is n_s·(N − Σ_present c_t) — the closed form that
        // replaces the grid
        "num_present + cast(n_s as decimal(38,0)) * (n_total - ct_present) AS num",
        "cast(n_s as decimal(38,0)) * n_total AS den")
      .selectExpr("source", "n_terms_in_source", "n_tokens_source",
        "cast((num * 1000000) div (2 * den) as bigint) AS tv_micro")
      .orderBy(col("source"))
  }

  /** Simpson diversity of each source's token distribution — the
    * probability two tokens drawn WITHOUT replacement are the same
    * type, `Σ nᵢ(nᵢ−1) / (N(N−1))`, reported floored to micro-units
    * (low repeat = diverse vocabulary; a boilerplate-stuffed source
    * scores high). Exact integers end to end — the ecology classic
    * that stands in for Shannon entropy here because entropy's `log`
    * cannot hash-compare across engines, while Simpson's rational
    * form can. Sources with fewer than 2 tokens report 0.
    *
    * 100 TB shape: one (source, token)-keyed partial-agg shuffle
    * (the type-count frame), one source-keyed fold over it — both
    * map-side combined; counts ride decimal(38,0) for the
    * `nᵢ(nᵢ−1)` products (≤N² ≈ 1e26 at 1e13 tokens/source). */
  def simpsonDiversity(docs: DataFrame, srcCol: String, textCol: String): DataFrame =
    docs.selectExpr(s"$srcCol AS source", s"${tokens(textCol)} AS toks")
      .selectExpr("source", "explode(toks) AS tok")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(expr("cast(n as decimal(38,0)) * (n - 1)")).as("rep"))
      .selectExpr("source", "n_tokens", "n_types",
        "cast(if(n_tokens < 2, 0, rep * 1000000" +
          " div (cast(n_tokens as decimal(38,0)) * (n_tokens - 1))) as bigint)" +
          " AS simpson_repeat_micro")
      .orderBy(col("source"))

  /** Lexical richness per source — hapax legomena (types seen once)
    * and dis legomena (types seen twice) counts plus the hapax share
    * of the vocabulary, floored micro-units. A natural corpus runs
    * ~40–60% hapax; template-generated text collapses far below
    * that, so the share is a cheap synthetic-text flag next to
    * [[simpsonDiversity]]'s repeat probability (which weighs TOKENS
    * where this weighs TYPES).
    *
    * 100 TB shape: the same two bounded shuffles as
    * [[simpsonDiversity]] — one (source, token) partial agg, one
    * source fold. */
  def lexicalRichness(docs: DataFrame, srcCol: String, textCol: String): DataFrame =
    docs.selectExpr(s"$srcCol AS source", s"${tokens(textCol)} AS toks")
      .selectExpr("source", "explode(toks) AS tok")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(expr("cast(n = 1 as bigint)")).as("n_hapax"),
        sum(expr("cast(n = 2 as bigint)")).as("n_dis"))
      .selectExpr("source", "n_types", "n_hapax", "n_dis",
        "cast((cast(n_hapax as decimal(38,0)) * 1000000) div n_types as bigint)" +
          " AS hapax_share_micro")
      .orderBy(col("source"))

  /** Within-document repetition gates — the Rae et al. 2021 (Gopher)
    * repetition filters in token-fraction form, pinned exactly:
    * `top2_share_micro` = the share of the doc's 2-gram POSITIONS
    * held by its most frequent 2-gram; `dup3_cov_micro` = the share
    * of TOKENS covered by 3-grams occurring ≥ 2 times within the doc
    * (exact coverage union via the [[graft.functions.ScrubKeep]]
    * two-pointer merge — every occurrence of a repeated 3-gram is a
    * covering window, including the first); `flagged` = top2 share
    * > 0.20 OR dup-3-gram coverage > 0.30 (the published rule
    * family's thresholds, pinned). Docs shorter than the window pass
    * with zero shares.
    *
    * 100 TB shape: 2-gram stats are one (doc, hash)-keyed partial agg
    * into a per-doc max fold (map-side combinable, never a corpus
    * window); 3-gram coverage is one (doc, hash)-partitioned window
    * count + a per-doc sorted-starts collect (bounded by doc length)
    * + the O(len + |cov|) keep merge. Hashes (8-byte longs), never
    * n-gram strings, in the shuffle. */
  def repetitionGates(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val base = docs.selectExpr(s"$idCol AS doc_id",
      s"cast(size(${tokens(textCol)}) as bigint) AS n",
      s"graft_shingle_hashes_all($textCol, 2) AS h2",
      s"graft_shingle_hashes_all($textCol, 3) AS h3")
    val top2 = base.selectExpr("doc_id", "explode(h2) AS h")
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top2_count"))
    val cov3 = base.selectExpr("doc_id", "posexplode(h3) AS (p0, h)")
      .selectExpr("doc_id", "cast(p0 + 1 as bigint) AS pos", "h")
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("h"))))
      .filter(col("cnt") >= 2)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cov"))
    base.select(col("doc_id"), col("n"))
      .join(top2, Seq("doc_id"), "left")
      .join(cov3, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n AS n_tokens",
        "coalesce(top2_count, 0L) AS top2_count",
        "coalesce(cov, cast(array() as array<bigint>)) AS cov")
      .selectExpr("doc_id", "n_tokens", "top2_count",
        "if(n_tokens < 2, 0L, (top2_count * 1000000) div (n_tokens - 1))" +
          " AS top2_share_micro",
        "n_tokens - cast(size(graft_scrub_keep(cov, 3, cast(n_tokens as int)))" +
          " as bigint) AS dup3_cov_tokens")
      .selectExpr("doc_id", "n_tokens", "top2_count", "top2_share_micro",
        "dup3_cov_tokens",
        "if(n_tokens = 0, 0L, (dup3_cov_tokens * 1000000) div n_tokens)" +
          " AS dup3_cov_micro")
      .selectExpr("doc_id", "n_tokens", "top2_count", "top2_share_micro",
        "dup3_cov_tokens", "dup3_cov_micro",
        "top2_share_micro > 200000 OR dup3_cov_micro > 300000 AS flagged")
  }

  /** Zipf-law fit over the corpus term-frequency distribution — the
    * one-row vocabulary-health audit a curation pass reads before
    * trusting frequency-based operators (a natural corpus reads slope
    * ≈ −1; a template-generated or boilerplate-heavy one reads much
    * flatter, a deduped-to-death one much steeper): OLS of ln(freq)
    * on ln(rank) over the top `maxRank` terms (rank by freq desc,
    * term asc — the deterministic tiebreak makes the fit set exact).
    *
    * Exact-integer contract: ln values land on a 1e-6 grid via
    * `floor(ln(x) * 1e6)` (both engines compute IEEE-double ln; a
    * grid-boundary disagreement needs the double within 1 ulp of a
    * micro boundary — measure-zero in practice and caught by the
    * oracle if it ever bites), and all OLS sums/ratios are
    * decimal(38,0) integer arithmetic from there, so slope/intercept/
    * r² in micro units are cell-exact across engines. r² is computed
    * as the staged integer division `((num*1e6 div den) * num) div
    * syy_den` — deterministic by construction (num² would overflow
    * decimal(38)).
    *
    * @return one row: (n_types, n_fit, slope_micro, intercept_micro,
    *         r2_micro).
    *
    * 100 TB shape: one (term)-keyed partial agg (map-side combinable)
    * → top-maxRank via TakeOrderedAndProject (no global sort
    * materializes the vocabulary), then every window/agg runs on the
    * bounded maxRank-row frame. */
  def zipfFit(docs: DataFrame, textCol: String, maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2, s"maxRank must be >= 2, got $maxRank")
    // eager guard (the waterfillBudget/evalContamination rule): an
    // empty or all-empty-text corpus would otherwise emit a single
    // all-NULL fit row — the silent-empty shape this repo rejects.
    // The probe early-stops at the first non-empty document.
    require(!docs.filter(expr(s"size(${tokens(textCol)}) > 0")).isEmpty,
      "zipfFit: corpus has no tokens - a NULL fit row would read as " +
        "a degenerate-but-valid fit; check the input")
    val tf = docs.selectExpr(s"explode(${tokens(textCol)}) AS term")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nTypes = tf.groupBy().agg(count(lit(1)).as("n_types"))
    val top = tf.orderBy(col("c").desc, col("term").asc).limit(maxRank)
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("c").desc, col("term").asc)))
      .selectExpr("cast(floor(ln(rk) * 1000000) as bigint) AS x",
        "cast(floor(ln(c) * 1000000) as bigint) AS y")
    top.groupBy().agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .crossJoin(broadcast(nTypes))
      .selectExpr("n_types", "cast(n as bigint) AS n_fit",
        "n * sxy - sx * sy AS num", "n * sxx - sx * sx AS den",
        "n * syy - sy * sy AS syy_den", "sx", "sy", "n")
      .selectExpr("n_types", "n_fit", "num", "syy_den", "sx", "sy", "n",
        "if(den = 0, cast(0 as decimal(38,0)), num * 1000000 div den) AS slope_d")
      .selectExpr("n_types", "n_fit",
        "cast(slope_d as bigint) AS slope_micro",
        "cast((sy - slope_d * sx div 1000000) div n as bigint)" +
          " AS intercept_micro",
        "cast(if(syy_den = 0, 1000000, " +
          "(slope_d * num) div syy_den) as bigint) AS r2_micro")
  }

  /** Heaps-law vocabulary-growth curve — [[zipfFit]]'s companion
    * audit: distinct types seen after each decile of the token
    * stream (docs in doc_id order, tokens in document order). A
    * natural corpus grows types ∝ tokens^β with β ≈ 0.5 (the curve
    * keeps rising at the last decile — more data keeps buying
    * vocabulary); a template corpus plateaus after the first decile
    * (more data buys nothing). The curve's SHAPE is the audit; its
    * last row's n_types equals the corpus type count by construction.
    *
    * The scalable trick: the cumulative-distinct curve needs no
    * ordered scan — a type is "seen by checkpoint c" iff its FIRST
    * occurrence position ≤ c, so one per-term min over global
    * positions (doc offset + in-doc position, offsets via the
    * bucketed cumsum — never a corpus-wide window) and a 10-bucket
    * histogram replace any notion of sequential state.
    *
    * @return `deciles` rows: (decile, checkpoint_tokens, new_types,
    *         n_types).
    *
    * 100 TB shape: one O(docs) offset cumsum (bucket-decomposed), one
    * doc-keyed equi-join to attach offsets, one term-keyed min agg
    * (map-side combinable), then a `deciles`-row histogram. */
  /** [[zipfFit]]'s grouped core over an arbitrary (grp, item, c)
    * count frame: per group, OLS of ln(c) on ln(rank) over the top
    * `maxRank` items (rank by c desc, item asc), same 1e-6 ln grid
    * and decimal(38,0) integer arithmetic. Groups with a degenerate
    * fit set (all counts equal, or a single item) follow zipfFit's
    * conventions (slope 0 / r² 1e6).
    *
    * @return one row per group: (grp, n_items, n_fit, slope_micro,
    *         intercept_micro, r2_micro).
    *
    * 100 TB shape: one grp-partitioned rank window (groups sort in
    * parallel; at real scale pre-prune items below a frequency floor
    * before ranking — the fit only reads the top maxRank) + one
    * grp-keyed combinable agg. */
  def lnLnFitGrouped(counts: DataFrame, maxRank: Int): DataFrame = {
    require(maxRank >= 2, s"lnLnFitGrouped needs maxRank >= 2, got $maxRank")
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c").desc, col("item").asc)
    val tot = counts.groupBy(col("grp")).agg(count(lit(1)).as("n_items"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxRank)
      .selectExpr("grp", "cast(floor(ln(rk) * 1000000) as bigint) AS x",
        "cast(floor(ln(c) * 1000000) as bigint) AS y")
      .groupBy(col("grp")).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .join(broadcast(tot), Seq("grp"))
      .selectExpr("grp", "n_items", "cast(n as bigint) AS n_fit",
        "n * sxy - sx * sy AS num", "n * sxx - sx * sx AS den",
        "n * syy - sy * sy AS syy_den", "sx", "sy", "n")
      .selectExpr("grp", "n_items", "n_fit", "num", "syy_den", "sx", "sy", "n",
        "if(den = 0, cast(0 as decimal(38,0)), num * 1000000 div den) AS slope_d")
      .selectExpr("grp", "n_items", "n_fit",
        "cast(slope_d as bigint) AS slope_micro",
        "cast((sy - slope_d * sx div 1000000) div n as bigint)" +
          " AS intercept_micro",
        "cast(if(syy_den = 0, 1000000, " +
          "(slope_d * num) div syy_den) as bigint) AS r2_micro")
      .orderBy(col("grp"))
  }

  def heapsCurve(docs: DataFrame, textCol: String, deciles: Int = 10): DataFrame = {
    require(deciles >= 2, s"heapsCurve needs deciles >= 2, got $deciles")
    val tk = docs.selectExpr("doc_id", s"${tokens(textCol)} AS t")
    val cnt = tk.selectExpr("doc_id", "cast(size(t) as bigint) AS nt")
    val off = Curate.bucketedCumsum(cnt, "doc_id", "nt")
      .select(col("doc_id"), col("before"))
    val first = tk.selectExpr("doc_id", "posexplode(t) AS (p0, term)")
      .selectExpr("doc_id", "cast(p0 + 1 as bigint) AS pos", "term")
      .join(off, Seq("doc_id"))
      .selectExpr("term", "before + pos AS gpos")
      .groupBy(col("term")).agg(min(col("gpos")).as("fp"))
    val tot = cnt.agg(sum(col("nt")).as("total_tokens"))
    val perBucket = first.crossJoin(broadcast(tot))
      .selectExpr("1 + size(filter(transform(sequence(1, " + deciles + "), " +
        s"k -> (cast(k as bigint) * total_tokens) div $deciles), " +
        "c -> c < fp)) AS b")
      .groupBy(col("b")).agg(count(lit(1)).as("new_types"))
    docs.sparkSession.range(1, deciles + 1).selectExpr("id AS decile")
      .join(perBucket, col("decile") === col("b"), "left")
      .crossJoin(broadcast(tot))
      .selectExpr("decile",
        s"(decile * total_tokens) div $deciles AS checkpoint_tokens",
        "coalesce(new_types, 0L) AS new_types")
      .withColumn("n_types", sum(col("new_types")).over(
        Window.partitionBy(lit(1)).orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy(col("decile"))
  }

  /** Moving-average type-token ratio (MATTR, Covington & McFall
    * 2010) — the length-robust lexical-diversity gate: raw TTR
    * (types/tokens) falls mechanically with document length, so a
    * corpus filter on it systematically kills long documents; MATTR
    * averages TTR over every `w`-token sliding window, making the
    * number comparable across lengths. Low MATTR flags template/
    * boilerplate text (the same Gopher-class signal as t48's
    * repetition gates, measured as diversity instead of repetition).
    *
    * Exact-integer contract: every window's type count is an
    * integer; `mattr_micro = (Σ_w types_w) * 1e6 div (n_windows·w)`
    * and `ttr_micro = types * 1e6 div n_tokens` are integer
    * divisions — cell-exact across engines, no doubles anywhere.
    * Docs shorter than `w` fall back to whole-doc TTR (1 window);
    * empty docs report zeros.
    *
    * @return one row per doc: (doc_id, n_tokens, n_windows,
    *         ttr_micro, mattr_micro).
    *
    * 100 TB shape: map-only projection, no shuffle at all — the
    * deliberate cost is O(w) work per token (each token is counted
    * in w windows); at the registered w=25 that is a fixed 25×
    * arithmetic factor on an embarrassingly parallel scan, the
    * classic trade for a length-unbiased gate. A native expression
    * (incremental window set maintenance, O(1) amortized per token)
    * is the optimization path if the gate ever dominates a profile. */
  def mattrDiversity(docs: DataFrame, textCol: String, w: Int = 25): DataFrame = {
    require(w >= 2, s"MATTR window must be >= 2 tokens, got $w")
    docs.selectExpr("doc_id", s"${tokens(textCol)} AS t")
      .selectExpr("doc_id", "t", "cast(size(t) as bigint) AS n_tokens")
      .selectExpr("doc_id", "t", "n_tokens",
        s"cast(if(n_tokens <= $w, least(n_tokens, 1L)," +
          s" n_tokens - ${w - 1}) as bigint) AS n_windows")
      .selectExpr("doc_id", "n_tokens", "n_windows",
        "if(n_tokens = 0, 0L, cast(size(array_distinct(t)) as bigint)" +
          " * 1000000 div n_tokens) AS ttr_micro",
        s"""case when n_tokens = 0 then 0L
           when n_tokens <= $w then
             cast(size(array_distinct(t)) as bigint) * 1000000 div n_tokens
           else aggregate(transform(sequence(1, cast(n_windows as int)),
               i -> cast(size(array_distinct(slice(t, i, $w))) as bigint)),
             0L, (a, x) -> a + x) * 1000000 div (n_windows * $w)
           end AS mattr_micro""")
  }
}
