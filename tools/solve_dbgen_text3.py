"""Exact dbgen dists solver v3: segment-anchored sentence location.

Facts proven so far: the text pool is 10 MiB (pin overlaps agree
byte-for-byte at span 10MiB - max), the pool walk consumes one global
Lehmer stream (seed 933588178) whose ratio sequence R[n] is fixed and
dists-independent, and pins cover ~16% of the pool in ~4.4k merged
covered segments.

Method: merge pins into covered byte segments; parse each complete
sentence in a segment into candidate draw templates (grammar pick,
phrase-shape picks, word picks, terminator pick — with parse-ambiguity
enumeration); walk segments left-to-right keeping a draw-index anchor,
and within a +-window locate each segment's first sentence by checking
template ratios against current (approximate) cumulative-weight
intervals with slack; chain the remaining sentences contiguously.
Accepted sentences yield EXACT (ratio -> entry) pairs for every draw.
Solving each category's entry order + minimal consistent integer
weights from those pairs, then iterating with the updated tables,
converges to dists.dss byte-exactness.

Run: python tools/solve_dbgen_text3.py [slack] [pass_no]
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
POOL_SEED = 933588178
POOL = 10 * 1024 * 1024
N_DRAWS = 2_400_000

CATS = {
    "N": "NOUNS", "V": "VERBS", "J": "ADJECTIVES", "D": "ADVERBS",
    "P": "PREPOSITIONS", "X": "AUXILIARIES", "T": "TERMINATORS",
    "G": "GRAMMAR", "NP": "NP", "VP": "VP",
}

VOC = {c: set(w for w, _ in getattr(D, CATS[c]))
       for c in ("N", "J", "D", "V", "X", "P")}
MULTI = sorted((w for c in ("N", "P", "X") for w in VOC[c] if " " in w),
               key=lambda w: -len(w.split()))
TERMS = {".", ";", ":", "?", "!", "--"}


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


def merge_segments(pins):
    """pins (sorted) -> [(start, bytes)] merged covered segments."""
    segs = []
    cur_s, cur_t = None, None
    for off, text, *_ in pins:
        if cur_s is None:
            cur_s, cur_t = off, text
            continue
        if off <= cur_s + len(cur_t):
            tail = off + len(text) - (cur_s + len(cur_t))
            if tail > 0:
                cur_t = cur_t + text[len(text) - tail:]
        else:
            segs.append((cur_s, cur_t))
            cur_s, cur_t = off, text
    if cur_s is not None:
        segs.append((cur_s, cur_t))
    return segs


def merge_multi(words):
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
    return toks


def sentence_templates(words, term, max_templates=40):
    """All structurally-valid draw templates for a complete sentence
    (grammar + shape + word + terminator picks, in draw order)."""
    toks = merge_multi(words)
    results = []

    def np_options(i):
        opts = []
        for shape, pat in (("N", "N"), ("J N", "JN"), ("J, J N", "JJN"),
                           ("D J N", "DJN")):
            k = len(pat)
            if i + k > len(toks):
                continue
            if all(toks[i + j] in VOC[pat[j]] for j in range(k)):
                opts.append((i + k,
                             [("NP", shape)] +
                             [(pat[j], toks[i + j]) for j in range(k)]))
        return opts

    def vp_options(i):
        opts = []
        for shape, pat in [(s, s.replace(" ", ""))
                           for s, _ in D.VP]:
            k = len(pat)
            if i + k > len(toks):
                continue
            if all(toks[i + j] in VOC[pat[j]] for j in range(k)):
                opts.append((i + k,
                             [("VP", shape)] +
                             [(pat[j], toks[i + j]) for j in range(k)]))
        return opts

    def walk(i, gram, draws):
        if len(results) >= max_templates:
            return
        if i == len(toks):
            for gpat, _ in D.GRAMMAR:
                if gpat == " ".join(gram) + " T":
                    results.append(draws + [("T", term)])
            return
        if len(gram) >= 4:
            return
        if toks[i] in VOC["P"] and i + 1 < len(toks) and toks[i + 1] == "the":
            for end, dr in np_options(i + 2):
                walk(end, gram + ["P"], draws + [("P", toks[i])] + dr)
        for end, dr in vp_options(i):
            walk(end, gram + ["V"], draws + dr)
        for end, dr in np_options(i):
            walk(end, gram + ["N"], draws + dr)

    walk(0, [], [])
    # prepend the grammar pick to each template
    out = []
    for tpl in results:
        gram_syms = [c for c, _ in tpl if c in ("NP", "VP", "P", "T")]
        # reconstruct grammar string from phrase picks in order
        gs = []
        for c, v in tpl:
            if c == "NP":
                gs.append("N")
            elif c == "VP":
                gs.append("V")
            elif c == "P":
                gs.append("P")
            elif c == "T":
                gs.append("T")
        # P is followed by an NP that is part of the P token
        g2 = []
        skip_next_np = False
        for s in gs:
            if s == "N" and skip_next_np:
                skip_next_np = False
                continue
            if s == "P":
                skip_next_np = True
            g2.append(s)
        gpat = " ".join(g2)
        if any(gpat == g for g, _ in D.GRAMMAR):
            out.append([("G", gpat)] + tpl)
    return out


def parse_segment(text):
    """Complete sentences in a covered segment -> list of
    (char_start, char_end, [templates]) in order."""
    sents = []
    for m in re.finditer(
            r"(?:(?<=[.;:?!] )|(?<=-- ))([a-zA-Z][a-zA-Z,' ]*?)"
            r"(--|[.;:?!])(?= |$)", text):
        body = m.group(1).rstrip()
        term = m.group(2)
        words = [w.rstrip(",") for w in body.split(" ") if w]
        if not words:
            continue
        tpls = sentence_templates(words, term)
        if tpls:
            sents.append((m.start(1), m.end(2), tpls))
    return sents


def locate_chain(R, iv, slack, n_lo, n_hi, sents):
    """Try to locate the full sentence chain of a segment starting in
    draw window [n_lo, n_hi]. Sentences must be draw-contiguous when
    textually adjacent; gaps (partial words between sentences) are not
    allowed inside a covered segment, so templates chain directly.
    Returns (start_draw, [(tpl, start)]) or None."""
    first = sents[0][2]
    cands = []
    for tpl in first:
        for n in range(n_lo, n_hi + 1):
            ok = 0
            for k, (cat, val) in enumerate(tpl):
                lo, hi = iv[cat].get(val, (0.0, 1.0))
                if lo <= R[n + k] < hi:
                    ok += 1
            if ok == len(tpl):
                cands.append((n, tpl))
    if len(cands) != 1:
        return None
    n0, tpl0 = cands[0]
    chain = [(tpl0, n0)]
    n = n0 + len(tpl0)
    for (cs, ce, tpls), prev in zip(sents[1:], sents):
        # textual adjacency: sentence starts right after previous end+1
        if cs != prev[1] + 1:
            return chain  # stop chaining at a break (partial word)
        matched = None
        for tpl in tpls:
            ok = all(
                iv[cat].get(val, (0.0, 1.0))[0] <= R[n + k] <
                iv[cat].get(val, (0.0, 1.0))[1]
                for k, (cat, val) in enumerate(tpl))
            if ok:
                if matched is not None:
                    return chain  # ambiguous continuation; stop
                matched = tpl
        if matched is None:
            return chain
        chain.append((matched, n))
        n += len(matched)
    return chain


def solve_category(pairs):
    """(ratio, value) pairs -> (ordered entries, weights, total) or None."""
    per = defaultdict(list)
    for r, v in pairs:
        per[v].append(r)
    order = sorted(per.items(), key=lambda kv: min(kv[1]))
    # check disjoint
    prev_hi = None
    for v, rs_ in order:
        lo, hi = min(rs_), max(rs_)
        if prev_hi is not None and lo < prev_hi:
            return None, order
        prev_hi = hi
    for S in range(len(order), 2000):
        bounds = []
        ok = True
        prev_vb = -1
        for v, rs_ in order:
            va = int(min(rs_) * S)
            vb = int(max(rs_) * S)
            if va <= prev_vb:
                ok = False
                break
            bounds.append((v, va, vb))
            prev_vb = vb
        if not ok:
            continue
        if bounds[0][1] != 0 or bounds[-1][2] != S - 1:
            continue
        if any(bounds[i + 1][1] != bounds[i][2] + 1
               for i in range(len(bounds) - 1)):
            continue
        return ([(v, vb - va + 1) for v, va, vb in bounds], order)
    return None, order


BPD = 6.333  # mean bytes per draw of the walk; only window sizing


def run_pass(R, iv, slack, segs, parsed):
    anchor_n, anchor_p = 0.0, 0
    exact = defaultdict(list)
    n_acc = n_rej = 0
    for (seg_off, seg_text), sents in zip(segs, parsed):
        if not sents:
            continue
        gap_bytes = seg_off + sents[0][0] - anchor_p
        gap_draws = max(1.0, gap_bytes / BPD)
        est = anchor_n + gap_draws
        # word-length variance ~= 0.48 relative sigma/draw -> window
        # grows with sqrt(gap); 4-sigma + slop
        spread = int(4 * 0.48 * (gap_draws ** 0.5)) + 10
        n_lo = max(0, int(est) - spread)
        n_hi = min(N_DRAWS - 80, int(est) + spread)
        chain = locate_chain(R, iv, slack, n_lo, n_hi, sents)
        # trust gates: multi-sentence chain, or a single long sentence
        if chain and not (
            len(chain) >= 2
            or (len(sents) == 1 and len(chain[0][0]) >= 12)
        ):
            chain = None
        if not chain:
            n_rej += 1
            continue
        n_acc += len(chain)
        for tpl, n in chain:
            for k, (cat, val) in enumerate(tpl):
                exact[cat].append((R[n + k], val))
        last_tpl, last_n = chain[-1]
        idx = len(chain) - 1
        anchor_n = last_n + len(last_tpl)
        anchor_p = seg_off + sents[idx][1] + 1
    return exact, n_acc, n_rej, BPD


def densest_cluster(rs, max_gap=0.012):
    """Longest run of sorted ratios whose consecutive gaps stay under
    ``max_gap``; (lo, hi, coverage_fraction)."""
    rs = sorted(rs)
    best = (rs[0], rs[0], 1)
    s = 0
    for i in range(1, len(rs) + 1):
        if i == len(rs) or rs[i] - rs[i - 1] > max_gap:
            if i - s > best[2]:
                best = (rs[s], rs[i - 1], i - s)
            s = i
    return best[0], best[1], best[2] / len(rs)


def refine_intervals(exact, slack):
    """New float intervals per category from located pairs: keep the
    table's entry order, set boundaries from robust per-value ratio
    ranges; unobserved values share the gap between observed
    neighbours."""
    iv = {}
    for cat, attr in CATS.items():
        entries = [v for v, _ in getattr(D, attr)]
        per = {}
        for r, v in exact.get(cat, []):
            per.setdefault(v, []).append(r)
        rob = {}
        for v, rs_ in per.items():
            lo, hi, cov = densest_cluster(rs_)
            if cov >= 0.6:
                rob[v] = (lo, hi)
        obs_sorted = sorted(rob, key=lambda v: (rob[v][0] + rob[v][1]) / 2)
        # boundaries between consecutive observed values
        cuts = [0.0]
        for a, b in zip(obs_sorted, obs_sorted[1:]):
            cuts.append((rob[a][1] + rob[b][0]) / 2)
        cuts.append(1.0)
        m = {}
        for i, v in enumerate(obs_sorted):
            m[v] = (max(0.0, cuts[i] - slack),
                    min(1.0, cuts[i + 1] + slack))
        # unobserved values: give full range (can't constrain yet)
        for v in entries:
            if v not in m:
                m[v] = (0.0, 1.0)
        iv[cat] = m
    return iv


def main():
    slack = float(sys.argv[1]) if len(sys.argv) > 1 else 0.04
    n_pass = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    pins = pickle.load(open("/tmp/dbgen_pins10.pkl", "rb"))
    pins.sort()
    segs = merge_segments(pins)
    print(f"{len(segs)} covered segments, "
          f"{sum(len(t) for _, t in segs):,} bytes")
    parsed = [parse_segment(t) for _, t in segs]
    n_sents = sum(len(s) for s in parsed)
    print(f"{n_sents:,} complete sentences parsed")
    R = ratio_stream(N_DRAWS)
    iv = intervals(slack)
    exact = {}
    for p in range(n_pass):
        exact, n_acc, n_rej, bpd = run_pass(R, iv, slack, segs, parsed)
        print(f"pass {p}: accepted {n_acc} sentences, rejected {n_rej} "
              f"segments, bpd {bpd:.3f}")
        sl = max(0.01, slack * (0.7 ** p))
        iv = refine_intervals(exact, sl)
    pickle.dump(dict(exact), open("/tmp/dbgen_exact10.pkl", "wb"))
    for cat in ("G", "NP", "VP", "T", "X", "P", "D", "V", "J", "N"):
        pairs = exact.get(cat, [])
        solved, order = solve_category(pairs)
        print(f"== {cat}: {len(pairs)} exact pairs, {len(order)} values "
              f"{'SOLVED' if solved else 'UNSOLVED/OVERLAP'}")
        if solved:
            total = sum(w for _, w in solved)
            print(f"   total={total}: " + ", ".join(
                f"{v}|{w}" for v, w in solved))
        else:
            prev_hi = None
            for v, rs_ in order:
                rs_.sort()
                ov = " OVERLAP" if prev_hi is not None and rs_[0] < prev_hi \
                    else ""
                prev_hi = max(prev_hi or 0.0, rs_[-1])
                print(f"   {str(v):18s} n={len(rs_):6d} "
                      f"[{rs_[0]:.6f}, {rs_[-1]:.6f}]{ov}")


if __name__ == "__main__":
    main()
