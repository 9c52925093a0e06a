#!/usr/bin/env python3
"""Generalized sampled-pair scale-correctness harness (VERDICT r15 #1):
the AUDIT_D09_ZIPF10 pattern — recompute exact truth for a seeded
sample of emitted pairs, and check every rejected candidate of a
seeded sample of docs for false negatives — extended to the pair
family's worst carriers at scales where the full DuckDB replay
exceeds the box:

  d02_ngram_jaccard_pairs   3-gram set Jaccard >= 0.5, df cap 64
  d08_containment_pairs     3-gram containment >= 0.6, df cap 64
  d31_exact_substr_pairs    8-token aligned spans, occurrence cap 16
  d21_lsh_recall_audit      MinHash(16)-LSH(4x4) recall on exact dups
  d35_dialogue_dedup        60-bit two-track dialogue fingerprint
  d09_weighted_jaccard      5-gram weighted Jaccard >= 0.4, df cap 64

Independence: per-pair/per-conversation truth is recomputed in PURE
PYTHON from the raw texts (token Counters + per-character polynomial
hashes — no Spark, no DuckDB lambdas). The only shared machinery is
the corpus-wide inverted index used for candidate enumeration, built
here with numpy via polynomial-hash COMPOSITION (H(a||b) =
H(a)*m^|b| + H(b) mod P); a per-doc sanity probe cross-checks the
composed hashes against the per-character fold on a random doc sample
before any candidate set is trusted.

Usage: scale_pair_audit.py <documents_parquet_dir> <spark_out_root>
         <out_dir> <tag> [queries_csv] [seed]
where <spark_out_root> holds the Verify-dumped parquet dirs
(d02_ngram_jaccard_pairs/ etc.) and <tag> names the slice (ZIPF100).
Writes <out_dir>/AUDIT_<id>_<tag>.json per query; exit 0 iff all pass.
"""
import sys, json, re, random, hashlib
from collections import Counter, defaultdict

import duckdb
import numpy as np

P = 1000000007
TOK_RE = re.compile(r"[^a-z0-9]+")


def tokens(text):
    return [t for t in TOK_RE.split(text.lower()) if t]


def polyhash(s, mult):
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % P
    return acc


def hash60(s):
    return polyhash(s, 31) * 1073741824 + polyhash(s, 131) % 1073741824


def shingle_strs(toks, n):
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def fold(xs, mult, seed):
    acc = seed
    for x in xs:
        acc = (acc * mult + x) % P
    return acc


# ---------------------------------------------------------------- corpus


class Corpus:
    """Tokenized corpus + composed shingle-hash indexes.

    Token stream is one flat int32 id array; per-distinct-token
    polynomial data (a31/m31/a131/m131) lets window hashes compose in
    O(n) vector ops per window width instead of O(chars)."""

    def __init__(self, docs_dir):
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, text FROM '{docs_dir}/*.parquet' ORDER BY doc_id"
        ).fetchall()
        con.close()
        self.doc_ids = np.array([r[0] for r in rows], dtype=np.int64)
        self.texts = {r[0]: r[1] for r in rows}
        vocab = {}
        stream = []
        lens = []
        for _, text in rows:
            ts = tokens(text)
            lens.append(len(ts))
            for t in ts:
                tid = vocab.get(t)
                if tid is None:
                    tid = len(vocab)
                    vocab[t] = tid
                stream.append(tid)
        self.tok = np.array(stream, dtype=np.int32)
        self.doc_len = np.array(lens, dtype=np.int64)
        self.doc_start = np.concatenate(([0], np.cumsum(self.doc_len)))[:-1]
        self.doc_of = np.repeat(np.arange(len(rows), dtype=np.int32),
                                self.doc_len)
        a31 = np.empty(len(vocab), dtype=np.int64)
        m31 = np.empty(len(vocab), dtype=np.int64)
        a131 = np.empty(len(vocab), dtype=np.int64)
        m131 = np.empty(len(vocab), dtype=np.int64)
        for t, tid in vocab.items():
            a31[tid] = polyhash(t, 31)
            m31[tid] = pow(31, len(t), P)
            a131[tid] = polyhash(t, 131)
            m131[tid] = pow(131, len(t), P)
        self.a31, self.m31, self.a131, self.m131 = a31, m31, a131, m131
        print(f"[audit] corpus: {len(rows)} docs, {self.tok.size} tokens, "
              f"{len(vocab)} distinct tokens", file=sys.stderr)

    def window_hashes(self, n):
        """(win_docidx, win_pos1based, h60) for every n-token window
        that stays inside one document. Composed, vectorized."""
        T = self.tok.size
        if T < n:
            return (np.empty(0, np.int32), np.empty(0, np.int64),
                    np.empty(0, np.int64))
        A31 = self.a31[self.tok]
        M31 = self.m31[self.tok]
        A131 = self.a131[self.tok]
        M131 = self.m131[self.tok]
        W = T - n + 1
        h31 = A31[:W].copy()
        h131 = A131[:W].copy()
        for j in range(1, n):
            # H(acc || ' ' || tok_j): acc*31+32 (space), shift by the
            # token's char length, add its hash. All operands < 2^30
            # after the % P, so products stay inside int64.
            h31 = ((h31 * 31 + 32) % P) * M31[j:W + j] % P
            h31 = (h31 + A31[j:W + j]) % P
            h131 = ((h131 * 131 + 32) % P) * M131[j:W + j] % P
            h131 = (h131 + A131[j:W + j]) % P
        valid = self.doc_of[:W] == self.doc_of[n - 1:]
        h60 = h31 * 1073741824 + h131 % 1073741824
        wdoc = self.doc_of[:W][valid]
        wpos = (np.arange(W, dtype=np.int64)[valid]
                - self.doc_start[wdoc] + 1)
        return wdoc.astype(np.int32), wpos, h60[valid]

    def probe(self, n, wdoc, wpos, h60, rnd, k=25):
        """Cross-check composed hashes vs per-character folds on k
        random docs with >= n tokens."""
        cand = [i for i in range(self.doc_ids.size) if self.doc_len[i] >= n]
        order = np.argsort(wdoc, kind="stable")
        sd, sp, sh = wdoc[order], wpos[order], h60[order]
        for i in rnd.sample(cand, min(k, len(cand))):
            lo = np.searchsorted(sd, i, "left")
            hi = np.searchsorted(sd, i, "right")
            got = dict(zip(sp[lo:hi].tolist(), sh[lo:hi].tolist()))
            toks = tokens(self.texts[self.doc_ids[i]])
            want = {j + 1: hash60(s)
                    for j, s in enumerate(shingle_strs(toks, n))}
            assert got == want, (
                f"composed window hashes disagree with per-char fold on "
                f"doc {self.doc_ids[i]} (n={n})")
        print(f"[audit] probe n={n}: composed hashes match per-char fold "
              f"on {min(k, len(cand))} docs", file=sys.stderr)


def distinct_doc_hash(wdoc, h60):
    """distinct (docidx, h60) pairs, sorted by (h60, docidx)."""
    order = np.lexsort((wdoc, h60))
    d, h = wdoc[order], h60[order]
    keep = np.ones(d.size, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return d[keep], h[keep]


def read_pairs(con, path, cols):
    return con.execute(
        f"SELECT {cols} FROM '{path}/*.parquet'").fetchall()


# ---------------------------------------------------- jaccard family


def audit_set_family(corpus, spark_dir, name, n, cap, threshold, metric,
                     rnd, n_pairs, n_seeds):
    """d02 (metric='jaccard') and d08 (metric='containment'), and the
    d09 weighted variant (metric='wjaccard', candidates on distinct
    n-shingles but scored on token multisets)."""
    wdoc, wpos, h60 = corpus.window_hashes(n)
    corpus.probe(n, wdoc, wpos, h60, rnd)
    dd, hh = distinct_doc_hash(wdoc, h60)
    # df per hash (doc frequency — dd,hh already distinct per doc)
    uh, first = np.unique(hh, return_index=True)
    df = np.diff(np.concatenate((first, [hh.size])))
    kept_h = uh[df <= cap]
    kept_mask = df[np.searchsorted(uh, hh)] <= cap
    kd, kh = dd[kept_mask], hh[kept_mask]     # sorted by (h, doc)
    # per-doc distinct set sizes
    sizes = np.zeros(corpus.doc_ids.size, dtype=np.int64)
    u, c = np.unique(dd, return_counts=True)
    sizes[u] = c
    id2idx = {int(v): i for i, v in enumerate(corpus.doc_ids)}

    def doc_sets(i):
        lo = np.searchsorted(corpus._dd_byd, i, "left")
        hi = np.searchsorted(corpus._dd_byd, i, "right")
        return set(corpus._hh_byd[lo:hi].tolist())

    # doc-sorted copy for per-doc set lookup
    order = np.argsort(dd, kind="stable")
    corpus._dd_byd, corpus._hh_byd = dd[order], hh[order]

    hot = uh[df > cap]

    def score(id1, id2):
        t1, t2 = tokens(corpus.texts[id1]), tokens(corpus.texts[id2])
        if metric == "wjaccard":
            c1, c2 = Counter(t1), Counter(t2)
            minsum = sum(min(v, c2[k]) for k, v in c1.items() if k in c2)
            return (minsum, len(t1), len(t2),
                    float(minsum) / float(len(t1) + len(t2) - minsum))
        s1 = set(hash60(s) for s in shingle_strs(t1, n))
        s2 = set(hash60(s) for s in shingle_strs(t2, n))
        # `shared` counts KEPT (df <= cap) shingles only — the capped
        # candidate machinery's count, matching both the operator and
        # its DuckDB oracle; set sizes n1/n2 stay uncapped.
        sh = sum(1 for h in (s1 & s2)
                 if not (np.searchsorted(hot, h) < hot.size
                         and hot[np.searchsorted(hot, h)] == h))
        if metric == "jaccard":
            m = float(sh) / float(len(s1) + len(s2) - sh)
        else:
            m = float(sh) / float(min(len(s1), len(s2)))
        return sh, len(s1), len(s2), m

    con = duckdb.connect()
    cols = ("d1, d2, minsum, t1, t2, wjaccard" if metric == "wjaccard"
            else f"d1, d2, shared, n1, n2, {metric}")
    emitted = read_pairs(con, spark_dir, cols)
    con.close()
    emitted_keys = {(r[0], r[1]) for r in emitted}
    print(f"[audit] {name}: emitted {len(emitted)}", file=sys.stderr)

    sample = rnd.sample(emitted, min(n_pairs, len(emitted)))
    mism = []
    for d1, d2, shared, n1, n2, m in sample:
        es, e1, e2, em = score(d1, d2)
        if (es, e1, e2) != (shared, n1, n2) or em != m or em < threshold:
            mism.append({"d1": d1, "d2": d2,
                         "got": [shared, n1, n2, m],
                         "want": [es, e1, e2, em]})
    print(f"[audit] {name}: sample {len(sample)}, {len(mism)} mismatches",
          file=sys.stderr)

    # seed-doc completeness: candidates = docs sharing a kept hash
    seeds = rnd.sample(range(corpus.doc_ids.size), n_seeds)
    rej = miss = phantom = 0
    miss_rows = []
    for i in seeds:
        sid = int(corpus.doc_ids[i])
        mine = np.array(sorted(doc_sets(i)), dtype=np.int64)
        if mine.size:
            mk = mine[df[np.searchsorted(uh, mine)] <= cap]
        else:
            mk = mine
        partners = set()
        for h in mk.tolist():
            lo = np.searchsorted(kh, h, "left")
            hi = np.searchsorted(kh, h, "right")
            partners.update(kd[lo:hi].tolist())
        partners.discard(i)
        cand_keys = set()
        for j in partners:
            pid = int(corpus.doc_ids[j])
            cand_keys.add((min(sid, pid), max(sid, pid)))
        for k_ in cand_keys:
            if k_ in emitted_keys:
                continue
            _, _, _, m = score(k_[0], k_[1])
            rej += 1
            if m >= threshold:
                miss += 1
                miss_rows.append({"d1": k_[0], "d2": k_[1], "metric": m})
        # soundness: emitted partners of the seed must be candidates
        for (a, b) in emitted_keys:
            if a == sid and (a, b) not in cand_keys and b != sid:
                if (min(a, b), max(a, b)) not in cand_keys:
                    phantom += 1
    print(f"[audit] {name}: seeds {len(seeds)}, rejected checked {rej}, "
          f"false-negatives {miss}, phantoms {phantom}", file=sys.stderr)
    return {
        "query": name, "n_shingle": n, "cap": cap, "threshold": threshold,
        "emitted_total": len(emitted), "emitted_sampled": len(sample),
        "emitted_mismatches": len(mism), "seed_docs": len(seeds),
        "rejected_checked": rej, "false_negatives": miss,
        "phantom_pairs": phantom,
        "mismatch_rows": mism[:10], "false_negative_rows": miss_rows[:10],
    }, not mism and not miss and not phantom


# ------------------------------------------------------ d31 spans


def audit_substr_pairs(corpus, spark_dir, rnd, n_pairs, n_seeds,
                       k=8, max_occ=16):
    wdoc, wpos, h60 = corpus.window_hashes(k)
    corpus.probe(k, wdoc, wpos, h60, rnd)
    # global eligibility: n_occ <= max_occ AND >= 2 distinct docs
    uh, first = np.unique(h60, return_index=True)
    order = np.argsort(h60, kind="stable")
    hs, ds, ps = h60[order], wdoc[order], wpos[order]
    n_occ = np.diff(np.concatenate(
        (np.searchsorted(hs, uh, "left"), [hs.size])))
    dd, hh = distinct_doc_hash(wdoc, h60)
    uh2, f2 = np.unique(hh, return_index=True)
    ndocs = np.diff(np.concatenate((f2, [hh.size])))
    assert np.array_equal(uh, uh2)
    elig_mask = (n_occ <= max_occ) & (ndocs >= 2)
    elig = uh[elig_mask]
    id2idx = {int(v): i for i, v in enumerate(corpus.doc_ids)}

    def doc_occ(docid):
        """pure-Python positional k-shingle hashes of one doc,
        restricted to globally-eligible hashes -> {h: [pos...]}"""
        toks = tokens(corpus.texts[docid])
        out = defaultdict(list)
        for j, s in enumerate(shingle_strs(toks, k)):
            h = hash60(s)
            idx = np.searchsorted(elig, h)
            if idx < elig.size and elig[idx] == h:
                out[h].append(j + 1)
        return out

    def spans(id1, id2):
        o1, o2 = doc_occ(id1), doc_occ(id2)
        diag = defaultdict(list)
        for h, ps1 in o1.items():
            if h not in o2:
                continue
            for p1 in ps1:
                for p2 in o2[h]:
                    diag[p1 - p2].append(p1)
        n_spans = 0
        max_span = 0
        tot = 0
        for _, pl in diag.items():
            pl = sorted(set(pl))
            start = prev = pl[0]
            for p in pl[1:]:
                if p - prev <= k:
                    prev = p
                else:
                    n_spans += 1
                    sp = prev - start + k
                    max_span = max(max_span, sp)
                    tot += sp
                    start = prev = p
            n_spans += 1
            sp = prev - start + k
            max_span = max(max_span, sp)
            tot += sp
        return n_spans, max_span, tot

    con = duckdb.connect()
    emitted = read_pairs(con, spark_dir,
                         "d1, d2, n_spans, max_span_tokens, span_tokens")
    con.close()
    emitted_keys = {(r[0], r[1]) for r in emitted}
    print(f"[audit] d31: emitted {len(emitted)}", file=sys.stderr)

    sample = rnd.sample(emitted, min(n_pairs, len(emitted)))
    mism = []
    for d1, d2, nsp, msp, tot in sample:
        ensp, emsp, etot = spans(d1, d2)
        if (ensp, emsp, etot) != (nsp, msp, tot):
            mism.append({"d1": d1, "d2": d2, "got": [nsp, msp, tot],
                         "want": [ensp, emsp, etot]})
    print(f"[audit] d31: sample {len(sample)}, {len(mism)} mismatches",
          file=sys.stderr)

    # completeness: every doc pair sharing an eligible hash MUST emit
    # a row (there is no threshold); soundness: every emitted partner
    # of a seed must share an eligible hash
    elig_sorted_mask = elig_mask[np.searchsorted(uh, hs)]
    ehs, eds = hs[elig_sorted_mask], ds[elig_sorted_mask]
    seeds = rnd.sample(range(corpus.doc_ids.size), n_seeds)
    miss = phantom = checked = 0
    miss_rows = []
    for i in seeds:
        sid = int(corpus.doc_ids[i])
        my_h = set(doc_occ(sid).keys())
        partners = set()
        for h in my_h:
            lo = np.searchsorted(ehs, h, "left")
            hi = np.searchsorted(ehs, h, "right")
            partners.update(eds[lo:hi].tolist())
        partners.discard(i)
        cand_keys = {(min(sid, int(corpus.doc_ids[j])),
                      max(sid, int(corpus.doc_ids[j]))) for j in partners}
        checked += len(cand_keys)
        for k_ in cand_keys:
            if k_ not in emitted_keys:
                miss += 1
                miss_rows.append({"d1": k_[0], "d2": k_[1]})
        for (a, b) in emitted_keys:
            if (a == sid or b == sid) and (a, b) not in cand_keys:
                phantom += 1
    print(f"[audit] d31: seeds {len(seeds)}, candidate pairs {checked}, "
          f"missing {miss}, phantoms {phantom}", file=sys.stderr)
    return {
        "query": "d31_exact_substr_pairs", "k": k, "max_occ": max_occ,
        "emitted_total": len(emitted), "emitted_sampled": len(sample),
        "emitted_mismatches": len(mism), "seed_docs": len(seeds),
        "candidate_pairs_of_seeds": checked, "missing_pairs": miss,
        "phantom_pairs": phantom, "mismatch_rows": mism[:10],
        "missing_rows": miss_rows[:10],
    }, not mism and not miss and not phantom


# ------------------------------------------------------ d03 lsh pairs


def audit_lsh_pairs(corpus, spark_dir, rnd, n_pairs, n_seeds,
                    n=3, k=16, bands=4, threshold=0.5):
    """d03_minhash_lsh_pairs: banded MinHash candidates + estimated
    Jaccard filter. Corpus-wide signatures are computed vectorized
    (np.minimum.reduceat over the distinct (doc, shingle-hash) arrays
    per permutation), band buckets by the positional fold; emitted
    pairs are re-scored with PURE-PYTHON signatures of both docs."""
    wdoc, wpos, h60 = corpus.window_hashes(n)
    corpus.probe(n, wdoc, wpos, h60, rnd)
    dd, hh = distinct_doc_hash(wdoc, h60)
    order = np.argsort(dd, kind="stable")
    sd, sh = dd[order], hh[order]
    uniq_docs, starts = np.unique(sd, return_index=True)
    bounds = np.concatenate((starts, [sd.size]))
    ndocs = corpus.doc_ids.size
    sigs = np.full((ndocs, k), P, dtype=np.int64)
    hmod = sh % P
    for i in range(k):
        a = ((i + 1) * 1103515245 + 12345) % P
        b = ((i + 1) * 69069 + 7) % P
        vals = (a * hmod + b) % P
        mins = np.minimum.reduceat(vals, bounds[:-1])
        sigs[uniq_docs, i] = mins
    # band buckets: positional fold mult 1000003 seed 7 over r-slices
    r = k // bands
    buckets = np.empty((ndocs, bands), dtype=np.int64)
    for b_ in range(bands):
        acc = np.full(ndocs, 7, dtype=np.int64)
        for j in range(r):
            acc = (acc * 1000003 + sigs[:, b_ * r + j]) % P
        buckets[:, b_] = acc

    def py_sig(docid):
        return minhash_sig(set(hash60(s) for s in
                               shingle_strs(tokens(corpus.texts[docid]), n)),
                           k)

    # probe: the vectorized signatures must agree with the pure-Python
    # fold before the bucket index is trusted for candidate sets
    for i in rnd.sample(range(ndocs), 25):
        assert sigs[i].tolist() == py_sig(int(corpus.doc_ids[i])), (
            f"vectorized minhash disagrees with pure-Python sig on doc "
            f"{corpus.doc_ids[i]}")
    print("[audit] d03 probe: vectorized sigs match pure-Python on 25 docs",
          file=sys.stderr)

    con = duckdb.connect()
    emitted = read_pairs(con, spark_dir, "d1, d2, matches, est_jaccard")
    con.close()
    emitted_keys = {(e[0], e[1]) for e in emitted}
    print(f"[audit] d03: emitted {len(emitted)}", file=sys.stderr)

    sample = rnd.sample(emitted, min(n_pairs, len(emitted)))
    id2idx = {int(v): i for i, v in enumerate(corpus.doc_ids)}
    mism = []
    for d1, d2, matches, est in sample:
        s1, s2 = py_sig(d1), py_sig(d2)
        m = sum(1 for x, y in zip(s1, s2) if x == y)
        b1 = {(b_, fold(s1[b_ * r:(b_ + 1) * r], 1000003, 7))
              for b_ in range(bands)}
        b2 = {(b_, fold(s2[b_ * r:(b_ + 1) * r], 1000003, 7))
              for b_ in range(bands)}
        if (m != matches or float(m) / k != est or est < threshold
                or not (b1 & b2)):
            mism.append({"d1": d1, "d2": d2, "got": [matches, est],
                         "want": [m, float(m) / k]})
    print(f"[audit] d03: sample {len(sample)}, {len(mism)} mismatches",
          file=sys.stderr)

    # seed-doc completeness: every bucket-mate with >= threshold
    # signature agreement must be emitted; soundness: emitted partners
    # must share a bucket
    seeds = rnd.sample(range(ndocs), n_seeds)
    bflat = buckets.ravel()
    border = np.argsort(bflat, kind="stable")
    bsorted = bflat[border]
    bdoc = np.repeat(np.arange(ndocs, dtype=np.int64), bands)[border]
    bband = np.tile(np.arange(bands, dtype=np.int64), ndocs)[border]
    rej = miss = phantom = 0
    miss_rows = []
    for i in seeds:
        sid = int(corpus.doc_ids[i])
        partners = set()
        for b_ in range(bands):
            v = buckets[i, b_]
            lo = np.searchsorted(bsorted, v, "left")
            hi = np.searchsorted(bsorted, v, "right")
            for j, jb in zip(bdoc[lo:hi].tolist(), bband[lo:hi].tolist()):
                if jb == b_ and j != i:
                    partners.add(j)
        cand_keys = {(min(sid, int(corpus.doc_ids[j])),
                      max(sid, int(corpus.doc_ids[j]))) for j in partners}
        for k_ in cand_keys:
            if k_ in emitted_keys:
                continue
            m = int(np.sum(sigs[id2idx[k_[0]]] == sigs[id2idx[k_[1]]]))
            rej += 1
            if float(m) / k >= threshold:
                miss += 1
                miss_rows.append({"d1": k_[0], "d2": k_[1], "matches": m})
        for (a, b2_) in emitted_keys:
            if (a == sid or b2_ == sid) and (a, b2_) not in cand_keys:
                phantom += 1
    print(f"[audit] d03: seeds {len(seeds)}, rejected checked {rej}, "
          f"false-negatives {miss}, phantoms {phantom}", file=sys.stderr)
    return {
        "query": "d03_minhash_lsh_pairs", "n_shingle": n, "k": k,
        "bands": bands, "threshold": threshold,
        "emitted_total": len(emitted), "emitted_sampled": len(sample),
        "emitted_mismatches": len(mism), "seed_docs": len(seeds),
        "rejected_checked": rej, "false_negatives": miss,
        "phantom_pairs": phantom, "mismatch_rows": mism[:10],
        "false_negative_rows": miss_rows[:10],
    }, not mism and not miss and not phantom


# ------------------------------------------------------ d21 recall


def minhash_sig(hset, k=16):
    if not hset:
        return [P] * k
    sig = []
    for i in range(k):
        a = ((i + 1) * 1103515245 + 12345) % P
        b = ((i + 1) * 69069 + 7) % P
        sig.append(min((a * (h % P) + b) % P for h in hset))
    return sig


def audit_d21(corpus, spark_dir, rnd, n_pairs, n=3, k=16, bands=4):
    groups = defaultdict(list)
    for did in corpus.doc_ids.tolist():
        key = hashlib.md5(corpus.texts[did].encode("utf-8")).digest()
        groups[key].append(did)
    n_truth = n_elig = 0
    elig_groups = []
    for ids in groups.values():
        g = len(ids)
        if g < 2:
            continue
        pairs = g * (g - 1) // 2
        n_truth += pairs
        if len(tokens(corpus.texts[ids[0]])) >= n:
            n_elig += pairs
            elig_groups.append(ids)
    con = duckdb.connect()
    row = con.execute(
        f"SELECT n_truth_pairs, n_eligible_pairs, n_caught, recall_micro "
        f"FROM '{spark_dir}/*.parquet'").fetchall()[0]
    con.close()
    count_ok = (row[0] == n_truth and row[1] == n_elig
                and row[2] == n_elig and row[3] == 1000000)
    print(f"[audit] d21: truth {n_truth} (spark {row[0]}), eligible "
          f"{n_elig} (spark {row[1]}), caught {row[2]}, recall {row[3]}",
          file=sys.stderr)
    # sampled eligible pairs: verify the LSH genuinely catches them
    # (independent sig + banding recompute per side)
    r = k // bands
    fails = 0
    checked = 0
    pool = []
    for ids in elig_groups:
        for a in range(len(ids) - 1):
            pool.append((ids[a], ids[a + 1]))
    sample = rnd.sample(pool, min(n_pairs, len(pool)))
    for d1, d2 in sample:
        s1 = minhash_sig(set(hash60(s) for s in
                             shingle_strs(tokens(corpus.texts[d1]), n)), k)
        s2 = minhash_sig(set(hash60(s) for s in
                             shingle_strs(tokens(corpus.texts[d2]), n)), k)
        b1 = {(b, fold(s1[b * r:(b + 1) * r], 1000003, 7))
              for b in range(bands)}
        b2 = {(b, fold(s2[b * r:(b + 1) * r], 1000003, 7))
              for b in range(bands)}
        matches = sum(1 for x, y in zip(s1, s2) if x == y)
        checked += 1
        if not (b1 & b2) or matches / k < 0.5:
            fails += 1
    print(f"[audit] d21: {checked} eligible pairs re-verified caught, "
          f"{fails} failures", file=sys.stderr)
    return {
        "query": "d21_lsh_recall_audit",
        "n_truth_pairs": n_truth, "n_eligible_pairs": n_elig,
        "spark_row": list(row), "counts_match": bool(count_ok),
        "pairs_reverified": checked, "reverify_failures": fails,
    }, count_ok and fails == 0


# ------------------------------------------------------ d35 dialogue


def dialogue_fp(toks):
    """two-track 60-bit fingerprint of the zipf-slice turn synthesis
    (8-token turns, even j = assistant)."""
    import math
    J = max(1, -(-len(toks) // 8))
    tha, thb = [], []
    for j in range(2, J + 1, 2):
        tt = toks[(j - 1) * 8:(j - 1) * 8 + 8]
        tha.append(fold([polyhash(t, 31) for t in tt], 1000003, 7))
        thb.append(fold([polyhash(t, 131) for t in tt], 999983, 13))
    if not tha:
        return 7 * 1073741824 + 13
    fa = fold(tha, 1000003, 7)
    fb = fold(thb, 999983, 13)
    return fa * 1073741824 + fb % 1073741824


def audit_d35(corpus, spark_dir, rnd, n_convs):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT conv_id, asst_fp, group_size, canonical_conv, is_canonical "
        f"FROM '{spark_dir}/*.parquet'").fetchall()
    con.close()
    by_conv = {r[0]: r for r in rows}
    complete = (len(rows) == corpus.doc_ids.size
                and len(by_conv) == corpus.doc_ids.size)
    # full-output group consistency over the emitted fp column
    by_fp = defaultdict(list)
    for r in rows:
        by_fp[r[1]].append(r)
    group_bad = 0
    for fp, rs in by_fp.items():
        canon = min(r[0] for r in rs)
        for r in rs:
            if (r[2] != len(rs) or r[3] != canon
                    or r[4] != (r[0] == canon)):
                group_bad += 1
    # sampled independent fingerprint recompute
    sample = rnd.sample(corpus.doc_ids.tolist(), n_convs)
    mism = []
    for did in sample:
        want = dialogue_fp(tokens(corpus.texts[did]))
        if by_conv[did][1] != want:
            mism.append({"conv_id": did, "got": by_conv[did][1],
                         "want": want})
    print(f"[audit] d35: {len(rows)} rows, complete={complete}, "
          f"group inconsistencies {group_bad}, sampled {len(sample)} fps, "
          f"{len(mism)} mismatches", file=sys.stderr)
    return {
        "query": "d35_dialogue_dedup", "rows": len(rows),
        "one_row_per_conversation": bool(complete),
        "group_inconsistencies": group_bad,
        "fps_sampled": len(sample), "fp_mismatches": len(mism),
        "mismatch_rows": mism[:10],
    }, complete and not group_bad and not mism


# ---------------------------------------------------------------- main


def main():
    docs_dir, out_root, out_dir, tag = sys.argv[1:5]
    queries = (sys.argv[5].split(",") if len(sys.argv) > 5 else
               ["d02", "d08", "d31", "d21", "d35", "d09"])
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    corpus = Corpus(docs_dir)
    all_ok = True
    for q in queries:
        rnd = random.Random(seed)
        if q == "d02":
            res, ok = audit_set_family(
                corpus, f"{out_root}/d02_ngram_jaccard_pairs",
                "d02_ngram_jaccard_pairs", 3, 64, 0.5, "jaccard",
                rnd, 400, 300)
        elif q == "d08":
            res, ok = audit_set_family(
                corpus, f"{out_root}/d08_containment_pairs",
                "d08_containment_pairs", 3, 64, 0.6, "containment",
                rnd, 400, 300)
        elif q == "d09":
            res, ok = audit_set_family(
                corpus, f"{out_root}/d09_weighted_jaccard",
                "d09_weighted_jaccard", 5, 64, 0.4, "wjaccard",
                rnd, 400, 300)
        elif q == "d03":
            res, ok = audit_lsh_pairs(
                corpus, f"{out_root}/d03_minhash_lsh_pairs", rnd, 400, 300)
        elif q == "d31":
            res, ok = audit_substr_pairs(
                corpus, f"{out_root}/d31_exact_substr_pairs", rnd, 400, 300)
        elif q == "d21":
            res, ok = audit_d21(
                corpus, f"{out_root}/d21_lsh_recall_audit", rnd, 400)
        elif q == "d35":
            res, ok = audit_d35(
                corpus, f"{out_root}/d35_dialogue_dedup", rnd, 400)
        else:
            raise SystemExit(f"unknown audit {q}")
        res["corpus"] = docs_dir
        res["seed"] = seed
        path = f"{out_dir}/AUDIT_{q.upper()}_{tag}.json"
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
        print(f"[audit] {'PASS' if ok else 'FAIL'} {q} -> {path}",
              file=sys.stderr)
        all_ok = all_ok and ok
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
