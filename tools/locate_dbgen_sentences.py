"""Exact dbgen dists solver: locate pin sentences in the LCG draw stream.

The pool generator consumes one global Lehmer LCG stream (seed
933588178) whose ratio sequence R[n] is FIXED and independent of the
distribution tables. Every complete sentence inside a pin implies a
known draw template: grammar pick, per-phrase pattern picks, one pick
per word, terminator pick — so the sentence can be located in draw-
index space by requiring R[n+k] to fall inside the (current, slack-
widened) cumulative-weight interval of each known choice. A >=10-draw
template matches essentially uniquely across the whole stream, and
every match yields EXACT (ratio -> chosen entry) ground truth pairs —
no fuzzy alignment, no circularity. Boundaries then fall out to ~1e-6
precision and exact integer weights are recovered per category.

Run: python tools/locate_dbgen_sentences.py [slack] [n_draws_millions]
"""

import pickle
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from glaredb_spark.sources import dbgen_dists as D  # noqa: E402
from glaredb_spark.sources.dbgen import pow_mod_vec  # noqa: E402

M = 2147483647
G = 16807
POOL_SEED = 933588178

CATS = {
    "N": "NOUNS", "V": "VERBS", "J": "ADJECTIVES", "D": "ADVERBS",
    "P": "PREPOSITIONS", "X": "AUXILIARIES", "T": "TERMINATORS",
    "G": "GRAMMAR", "NP": "NP", "VP": "VP",
}


def ratio_stream(n):
    out = np.empty(n, dtype=np.float64)
    chunk = 8_000_000
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        idx = np.arange(s + 1, e + 1, dtype=np.uint64)
        seeds = (np.uint64(POOL_SEED) * pow_mod_vec(idx)) % np.uint64(M)
        out[s:e] = seeds.astype(np.float64) / float(M)
    return out


def intervals(slack):
    """value -> (lo, hi) fraction interval per category, slack-widened."""
    iv = {}
    for cat, attr in CATS.items():
        entries = getattr(D, attr)
        total = sum(w for _, w in entries)
        cum = 0
        m = {}
        for v, w in entries:
            lo = cum / total
            hi = (cum + w) / total
            m[v] = (max(0.0, lo - slack), min(1.0, hi + slack))
            cum += w
        iv[cat] = m
    return iv


VOC = {c: set(w for w, _ in getattr(D, CATS[c]))
       for c in ("N", "J", "D", "V", "X", "P")}
MULTI = sorted((w for c in ("N", "P", "X") for w in VOC[c] if " " in w),
               key=lambda w: -len(w.split()))


def cat_of(w):
    cats = [c for c in ("N", "J", "D", "V", "X", "P") if w in VOC[c]]
    return cats


def sentence_templates(words, term):
    """All structurally-valid draw templates for a sentence.
    Returns list of [(cat, value), ...] including pattern picks."""
    # merge multiword vocab entries
    toks = []
    i = 0
    while i < len(words):
        hit = None
        for mw in MULTI:
            p = mw.split(" ")
            if words[i:i + len(p)] == p:
                hit = mw
                break
        if hit:
            toks.append(hit)
            i += len(hit.split(" "))
        else:
            toks.append(words[i])
            i += 1
    results = []

    def np_options(i):
        """(end_index, shape, draws) options for a noun phrase at i."""
        opts = []
        for shape, pat in (("N", "N"), ("J N", "JN"), ("J, J N", "JJN"),
                           ("D J N", "DJN")):
            k = len(pat)
            if i + k > len(toks):
                continue
            ok = all(toks[i + j] in VOC[pat[j]] for j in range(k))
            if ok:
                opts.append((i + k, shape,
                             [("NP", shape)] +
                             [(pat[j], toks[i + j]) for j in range(k)]))
        return opts

    def vp_options(i):
        opts = []
        for shape, pat in (("V", "V"), ("V D", "VD"), ("X V", "XV"),
                           ("X V D", "XVD")):
            k = len(pat)
            if i + k > len(toks):
                continue
            ok = all(toks[i + j] in VOC[pat[j]] for j in range(k))
            if ok:
                opts.append((i + k, shape,
                             [("VP", shape)] +
                             [(pat[j], toks[i + j]) for j in range(k)]))
        return opts

    def walk(i, gram, draws):
        if i == len(toks):
            for gpat, _ in D.GRAMMAR:
                if gpat == " ".join(gram) + " T":
                    results.append([("G", gpat)] + draws + [("T", term)])
            return
        if len(gram) >= 5:
            return
        # prepositional phrase
        if toks[i] in VOC["P"] and i + 1 < len(toks) and toks[i + 1] == "the":
            for end, shape, dr in np_options(i + 2):
                walk(end, gram + ["P"],
                     draws + [("P", toks[i])] + dr)
        for end, shape, dr in vp_options(i):
            walk(end, gram + ["V"], draws + dr)
        for end, shape, dr in np_options(i):
            walk(end, gram + ["N"], draws + dr)

    walk(0, [], [])
    return results


def extract_sentences(pins, min_draws=8):
    """Complete sentences inside pins, grouped per pin with adjacency:
    [(pin_off, [(start_char, end_char, templates, body), ...]), ...]"""
    out = []
    for off, text in pins:
        sents = []
        for m in re.finditer(
                r"(?<=[.;:?!] )([a-z][a-zA-Z,' ]*?)(--|[.;:?!])(?= |$)"
                r"|(?<=-- )([a-z][a-zA-Z,' ]*?)(--|[.;:?!])(?= |$)",
                text):
            body = (m.group(1) or m.group(3)).rstrip()
            term_g = m.group(2) or m.group(4)
            m_start = m.start(1) if m.group(1) else m.start(3)
            m_end = m.end(2) if m.group(2) else m.end(4)
            words = [w.rstrip(",") for w in body.split(" ") if w]
            tpls = sentence_templates(words, term_g)
            tpls = [t for t in tpls if len(t) >= min_draws]
            if tpls:
                sents.append((m_start, m_end, tpls, body))
        if sents:
            out.append((off, sents))
    return out


def locate(R, RS, SORT, tpls, max_seed_width=0.12):
    """Candidate start indices matching any template: seed from the
    narrowest constraint via one sorted-range lookup, verify the rest
    by direct indexing. Returns (hits, skipped_flag)."""
    found = []
    skipped = True
    for tpl in tpls:
        iv = _IV
        widths = sorted(
            (iv[cat][val][1] - iv[cat][val][0], k, cat, val)
            for k, (cat, val) in enumerate(tpl)
        )
        w0, k0, c0, v0 = widths[0]
        if w0 > max_seed_width:
            continue  # would be too slow; rely on rare-word sentences
        skipped = False
        lo, hi = iv[c0][v0]
        a, b = np.searchsorted(RS, lo), np.searchsorted(RS, hi)
        cand = SORT[a:b].astype(np.int64) - k0
        cand = cand[(cand >= 0) & (cand + len(tpl) <= len(R))]
        for _, k, cat, val in widths[1:]:
            if len(cand) == 0:
                break
            lo, hi = iv[cat][val]
            rk = R[cand + k]
            cand = cand[(rk >= lo) & (rk < hi)]
        if len(cand):
            for c in cand:
                found.append((int(c), tpl))
    return found, skipped


def main():
    slack = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
    nM = float(sys.argv[2]) if len(sys.argv) > 2 else 70
    global _IV
    _IV = intervals(slack)
    R = ratio_stream(int(nM * 1e6))
    SORT = np.argsort(R).astype(np.int32)
    RS = R[SORT]
    pins = sorted(pickle.load(open("/tmp/dbgen_pins.pkl", "rb")))
    groups = extract_sentences(pins)
    n_sents = sum(len(g[1]) for g in groups)
    print(f"{n_sents} locatable sentences in {len(groups)} pins; "
          f"R={len(R)} draws")
    exact = defaultdict(list)
    n_chain = n_nochain = 0
    sent_positions = []
    for off, sents in groups:
        if len(sents) < 2:
            continue
        all_hits = [locate(R, RS, SORT, tpls)[0] for _, _, tpls, _ in sents]
        # chain acceptance: adjacent sentences (end_char + 1 ==
        # next start_char) whose hits are draw-contiguous
        accepted = {}
        for i in range(len(sents) - 1):
            if sents[i][1] + 1 != sents[i + 1][0]:
                continue  # not textually adjacent
            ends = {h[0] + len(h[1]): h for h in all_hits[i]}
            for h2 in all_hits[i + 1]:
                if h2[0] in ends:
                    accepted[i] = ends[h2[0]]
                    accepted[i + 1] = h2
        if not accepted:
            n_nochain += 1
            continue
        n_chain += len(accepted)
        for i, (start, tpl) in accepted.items():
            for k, (cat, val) in enumerate(tpl):
                exact[cat].append((R[start + k], val))
            sent_positions.append(
                (start, (off, sents[i][0], sents[i][3]))
            )
    print(f"chained {n_chain} sentences; {n_nochain} pins without chains")
    pickle.dump((dict(exact), sent_positions),
                open("/tmp/dbgen_exact_constraints.pkl", "wb"))
    # report per-category exact intervals
    for cat in ("G", "NP", "VP", "T", "X", "D", "V", "J", "N", "P"):
        pairs = exact.get(cat, [])
        per = defaultdict(list)
        for r, v in pairs:
            per[v].append(r)
        print(f"== {cat}: {len(pairs)} exact constraints")
        order = sorted(per.items(), key=lambda kv: min(kv[1]))
        prev_hi = None
        for v, rs_ in order:
            rs_.sort()
            overlap = " OVERLAP" if prev_hi is not None and rs_[0] < prev_hi \
                else ""
            prev_hi = max(prev_hi or 0, rs_[-1])
            print(f"   {v:18s} n={len(rs_):6d} "
                  f"[{rs_[0]:.6f}, {rs_[-1]:.6f}]{overlap}")


if __name__ == "__main__":
    main()
