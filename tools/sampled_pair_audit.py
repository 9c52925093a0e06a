#!/usr/bin/env python3
"""Sampled-pair oracle for d09 (weighted Jaccard) at scales where the
full DuckDB replay exceeds single-node disk (VERDICT r14 #4: the
candidate-by-term join spills past the box's free disk at zipf_x10).

Instead of replaying the whole candidate join, this audits the Spark
output on a SEEDED sample, recomputing everything independently in
pure Python (token Counters + the 60-bit polyhash — no Spark, no
DuckDB joins):

  1. EMITTED side: a seeded sample of the emitted pairs; recompute
     minsum / t1 / t2 / wjaccard exactly and require a cell-exact
     match (wjaccard compared as the same single IEEE division).
  2. REJECTED side: a seeded sample of SEED DOCS; enumerate every
     candidate partner of each seed doc exactly (shared >=1 distinct
     5-shingle hash with corpus df <= cap, the operator's own
     candidate rule, df computed over the FULL corpus); every
     candidate NOT in the emitted set must have wjaccard < threshold,
     and every candidate >= threshold must be emitted (per-seed-doc
     COMPLETENESS, not just soundness).

Usage: sampled_pair_audit.py <emitted_parquet_dir> <documents_parquet>
         <out_json> [n_pair_sample=200] [n_seed_docs=300] [seed=15]
"""
import sys, json, re, random
from collections import Counter

import duckdb

P = 1000000007
N_SHINGLE = 5
CAP = 64
THRESHOLD = 0.4


def tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def polyhash(s, mult):
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % P
    return acc


def hash60(s):
    return polyhash(s, 31) * 1073741824 + polyhash(s, 131) % 1073741824


def shingle_hashes(toks):
    return {
        hash60(" ".join(toks[i:i + N_SHINGLE]))
        for i in range(len(toks) - N_SHINGLE + 1)
    }


def wjacc(ta, tb):
    ca, cb = Counter(ta), Counter(tb)
    minsum = sum(min(c, cb[t]) for t, c in ca.items() if t in cb)
    t1, t2 = len(ta), len(tb)
    return minsum, t1, t2, float(minsum) / float(t1 + t2 - minsum)


def main():
    emitted_dir, docs_path, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    n_seeds = int(sys.argv[5]) if len(sys.argv) > 5 else 300
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 15
    rnd = random.Random(seed)

    con = duckdb.connect()
    docs_glob = f"{docs_path}/*.parquet"
    emitted = con.execute(
        f"SELECT d1, d2, minsum, t1, t2, wjaccard FROM '{emitted_dir}/*.parquet'"
    ).fetchall()
    emitted_keys = {(r[0], r[1]) for r in emitted}
    print(f"[audit] emitted pairs: {len(emitted)}", file=sys.stderr)

    def texts_of(ids):
        if not ids:
            return {}
        idlist = ",".join(str(i) for i in ids)
        return dict(con.execute(
            f"SELECT doc_id, text FROM '{docs_glob}' WHERE doc_id IN ({idlist})"
        ).fetchall())

    # --- 1. emitted sample: cell-exact recompute -------------------
    sample = rnd.sample(emitted, min(n_pairs, len(emitted)))
    need = sorted({r[0] for r in sample} | {r[1] for r in sample})
    txt = texts_of(need)
    mism = []
    for d1, d2, minsum, t1, t2, wj in sample:
        em, e1, e2, ew = wjacc(tokens(txt[d1]), tokens(txt[d2]))
        if (em, e1, e2) != (minsum, t1, t2) or ew != wj or ew < THRESHOLD:
            mism.append({"d1": d1, "d2": d2, "got": [minsum, t1, t2, wj],
                         "want": [em, e1, e2, ew]})
    print(f"[audit] emitted sample {len(sample)}: {len(mism)} mismatches",
          file=sys.stderr)

    # --- 2. seed-doc completeness + rejected soundness -------------
    # full-corpus df (one group-by — the cheap half; only the pair
    # join is disk-infeasible). Shingle hashing in SQL mirrors
    # hash60() above; spot-verified against it per seed doc below.
    ph = lambda mult: (
        "list_reduce(list_concat([0::BIGINT], list_transform("
        "range(1, length(s) + 1), j -> ord(s[j]))), "
        f"(a, c) -> (a * {mult} + c) % {P})")
    con.execute(f"""
      CREATE TEMP TABLE kept AS
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x != '') AS t
        FROM '{docs_glob}'),
      strs AS (SELECT doc_id,
          list_transform(range(1, greatest(len(t) - {N_SHINGLE - 1}, 0) + 1),
            i -> array_to_string(t[i:i+{N_SHINGLE - 1}], ' ')) AS ss
        FROM t),
      sh AS (SELECT doc_id, list_distinct(list_transform(ss,
          s -> {ph(31)} * 1073741824 + {ph(131)} % 1073741824)) AS hs
        FROM strs),
      e AS (SELECT doc_id, unnest(hs) AS sgl FROM sh),
      hot AS (SELECT sgl FROM e GROUP BY sgl HAVING count(*) > {CAP})
      SELECT doc_id, sgl FROM e ANTI JOIN hot USING (sgl)""")

    all_ids = [r[0] for r in con.execute(
        f"SELECT DISTINCT doc_id FROM '{docs_glob}'").fetchall()]
    seeds = rnd.sample(all_ids, min(n_seeds, len(all_ids)))
    con.execute("CREATE TEMP TABLE seeds(doc_id BIGINT)")
    con.executemany("INSERT INTO seeds VALUES (?)", [(s,) for s in seeds])
    cands = con.execute("""
      SELECT DISTINCT least(s.doc_id, k.doc_id), greatest(s.doc_id, k.doc_id)
      FROM kept s JOIN kept k USING (sgl)
      WHERE s.doc_id IN (SELECT doc_id FROM seeds) AND s.doc_id <> k.doc_id
    """).fetchall()
    print(f"[audit] seed docs {len(seeds)}: {len(cands)} candidate pairs",
          file=sys.stderr)

    # sanity: the SQL shingle hashing must agree with hash60() (else
    # the candidate set audits the wrong universe)
    probe = seeds[0]
    sql_hs = {r[0] for r in con.execute(
        "SELECT sgl FROM kept WHERE doc_id = ?", [probe]).fetchall()}
    ptoks = tokens(texts_of([probe])[probe])
    py_hs = shingle_hashes(ptoks)
    hot_all = py_hs - (sql_hs | set())  # py side has no df cap
    assert sql_hs <= py_hs, "SQL shingle hashes disagree with hash60()"
    print(f"[audit] hash probe doc {probe}: {len(sql_hs)} kept / "
          f"{len(py_hs)} total ({len(hot_all)} over cap)", file=sys.stderr)

    need2 = sorted({d for pr in cands for d in pr})
    # fetch in chunks to keep the IN-list sane
    txt2 = {}
    for i in range(0, len(need2), 5000):
        txt2.update(texts_of(need2[i:i + 5000]))
    rej_checked = miss = 0
    miss_rows = []
    for d1, d2 in cands:
        if (d1, d2) in emitted_keys:
            continue  # soundness of emitted values audited in step 1
        _, _, _, wj = wjacc(tokens(txt2[d1]), tokens(txt2[d2]))
        rej_checked += 1
        if wj >= THRESHOLD:
            miss += 1
            miss_rows.append({"d1": d1, "d2": d2, "wjaccard": wj})
    print(f"[audit] rejected candidates checked: {rej_checked}, "
          f"false-negatives: {miss}", file=sys.stderr)

    result = {
        "query": "d09_weighted_jaccard",
        "corpus": docs_path,
        "threshold": THRESHOLD, "cap": CAP, "n_shingle": N_SHINGLE,
        "seed": seed,
        "emitted_total": len(emitted),
        "emitted_sampled": len(sample),
        "emitted_mismatches": len(mism),
        "seed_docs": len(seeds),
        "candidate_pairs_of_seeds": len(cands),
        "rejected_checked": rej_checked,
        "false_negatives": miss,
        "mismatch_rows": mism[:10],
        "false_negative_rows": miss_rows[:10],
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    ok = not mism and not miss
    print(f"[audit] {'PASS' if ok else 'FAIL'} -> {out_json}", file=sys.stderr)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
