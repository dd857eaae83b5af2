"""Recover dbgen's dists.dss word weights/orders from pinned pool bytes.

Pins = (offset, text) samples of the true 300 MB pool, derived from the
reference's checked-in dbgen SF0.01 CSVs (comment columns) + the
region comments, with offsets computed from the already-validated
comment streams. We build an instrumented pool prefix with the current
candidate dists (tracking every draw's ratio + chosen entry), align
each pin to the generated token stream (drift-tracked window + word-
level SequenceMatcher), and collect (category, ratio -> true word)
constraints from equal runs and 1:1 substitutions. Sorting each
category's constraints by ratio yields the entry ORDER directly and
pins the cumulative boundaries; the smallest consistent integer total
gives exact weights.

Run:  python tools/solve_dbgen_text.py [prefix_mb]
"""

import bisect
import difflib
import pickle
import sys
from collections import Counter, defaultdict

sys.path.insert(0, ".")

from glaredb_spark.sources import dbgen_dists as D  # noqa: E402

_TERMS = {".", ";", ":", "?", "!", "--"}

CATS = {
    "N": "NOUNS", "V": "VERBS", "J": "ADJECTIVES", "D": "ADVERBS",
    "P": "PREPOSITIONS", "X": "AUXILIARIES", "T": "TERMINATORS",
}


def build_tracked(size):
    from glaredb_spark.sources.dbgen_pool import _RatioStream, _dist, POOL_SEED

    rs = _RatioStream(POOL_SEED)
    dists = {name: _dist(getattr(D, attr))
             for name, attr in [("G", "GRAMMAR"), ("NP", "NP"),
                                ("VP", "VP")] +
             [(k, v) for k, v in CATS.items()]}
    out = bytearray()
    # token stream: (byte_pos, word, cat, ratio) — literal 'the' cat '_'
    toks = []
    wb = {k: [w.encode() for w in dists[k][0]] for k in CATS}

    def pick_pat(cat):
        vals, cum, total = dists[cat]
        r = rs.take()
        v = int(r * total)
        lo = bisect.bisect_right(cum, v)
        toks.append((len(out), "\x00" + vals[lo], cat, r))  # pattern marker
        return vals[lo]

    def word(cat):
        vals, cum, total = dists[cat]
        r = rs.take()
        v = int(r * total)
        lo = bisect.bisect_right(cum, v)
        toks.append((len(out), vals[lo], cat, r))
        out.extend(wb[cat][lo])

    def noun_phrase():
        pat = pick_pat("NP")
        first = True
        for sym in pat.split(" "):
            if not first:
                out.extend(b" ")
            first = False
            if sym == "N":
                word("N")
            elif sym == "J":
                word("J")
            elif sym == "J,":
                word("J"); out.extend(b",")
            elif sym == "D":
                word("D")

    def verb_phrase():
        pat = pick_pat("VP")
        first = True
        for sym in pat.split(" "):
            if not first:
                out.extend(b" ")
            first = False
            word({"V": "V", "X": "X", "D": "D"}[sym])

    while len(out) < size:
        pat = pick_pat("G")
        for sym in pat.split(" "):
            if sym == "N":
                noun_phrase(); out.extend(b" ")
            elif sym == "V":
                verb_phrase(); out.extend(b" ")
            elif sym == "P":
                word("P")
                toks.append((len(out), "the", "_", 0.0))
                out.extend(b" the ")
                noun_phrase(); out.extend(b" ")
            elif sym == "T":
                if out and out[-1] == 0x20:
                    del out[-1]
                word("T"); out.extend(b" ")
    return bytes(out), toks


MULTIWORD = sorted(
    [w for w, _ in D.NOUNS + D.PREPOSITIONS + D.AUXILIARIES
     if " " in w],
    key=lambda w: -len(w.split()),
)


def pin_tokens(text):
    """Pin text -> word tokens comparable to generated stream tokens:
    punctuation split off, commas dropped, multiword entries re-joined;
    first and last token dropped (may be truncated)."""
    raw = []
    for w in text.split(" "):
        if not w:
            continue
        # peel terminators off the end
        term = None
        if w.endswith("--"):
            term, w = "--", w[:-2]
        elif w and w[-1] in ".;:?!":
            term, w = w[-1], w[:-1]
        w = w.rstrip(",")
        if w:
            raw.append(w)
        if term:
            raw.append(term)
    # merge multiwords
    merged = []
    i = 0
    while i < len(raw):
        hit = None
        for mw in MULTIWORD:
            parts = mw.split(" ")
            if raw[i:i + len(parts)] == parts:
                hit = mw
                break
        if hit:
            merged.append(hit)
            i += len(hit.split(" "))
        else:
            merged.append(raw[i])
            i += 1
    return merged[1:-1] if len(merged) > 2 else []


def align_and_collect(pool, toks, pins, window=4000):
    tok_words = []  # visible tokens (exclude pattern markers)
    tok_meta = []
    markers = []  # (byte_pos, kind, ratio, chosen_shape)
    for pos, w, cat, r in toks:
        if w.startswith("\x00"):
            markers.append((pos, cat, r, w[1:]))
            continue
        tok_words.append(w)
        tok_meta.append((pos, cat, r))
    positions = [m[0] for m in tok_meta]
    marker_pos = [m[0] for m in markers]
    constraints = defaultdict(list)
    pat_constraints = defaultdict(list)
    drift = 0
    located = 0
    stats = Counter()
    desync_samples = []
    exact = 0
    for off, text in pins:
        if pool[off:off + len(text)] == text.encode():
            exact += 1
        center = off + drift
        if center < 0 or center + window >= len(pool):
            stats["oob"] += 1
            continue
        pw = pin_tokens(text)
        if len(pw) < 4:
            stats["short"] += 1
            continue
        a = bisect.bisect_left(positions, center - window)
        b = bisect.bisect_left(positions, center + window + len(text))
        myw = tok_words[a:b]
        sm = difflib.SequenceMatcher(None, myw, pw, autojunk=False)
        blocks = [blk for blk in sm.get_matching_blocks() if blk.size > 0]
        if not blocks:
            stats["no_match"] += 1
            continue
        best = max(blocks, key=lambda blk: blk.size)
        if best.size < 3:
            stats["weak"] += 1
            continue
        located += 1
        # drift update from best block's first token
        mi = a + best.a
        # approximate char position of pin token best.b: reconstruct
        # via cumulative word lengths (approximation fine: ±2 from
        # punctuation) — use search of the word in text instead
        drift = tok_meta[mi][0] - (off + _pin_char_pos(text, pw, best.b))
        # collect constraints: equal runs of >=3 tokens are trusted;
        # substitutions only when 1:1 and sandwiched between equal runs
        # of >=2 on both sides (locked alignment)
        ops = sm.get_opcodes()
        for oi, (tag, i1, i2, j1, j2) in enumerate(ops):
            if tag == "equal" and (i2 - i1) >= 3:
                for k in range(i2 - i1):
                    pos, cat, r = tok_meta[a + i1 + k]
                    if cat != "_":
                        constraints[cat].append((r, pw[j1 + k]))
                        stats["eq"] += 1
            elif tag == "replace" and (i2 - i1) == (j2 - j1) <= 3:
                before_ok = (oi > 0 and ops[oi - 1][0] == "equal"
                             and ops[oi - 1][2] - ops[oi - 1][1] >= 2)
                after_ok = (oi + 1 < len(ops) and ops[oi + 1][0] == "equal"
                            and ops[oi + 1][2] - ops[oi + 1][1] >= 2)
                if before_ok and after_ok:
                    for k in range(i2 - i1):
                        pos, cat, r = tok_meta[a + i1 + k]
                        if cat != "_":
                            constraints[cat].append((r, pw[j1 + k]))
                            stats["sub"] += 1
            elif tag in ("insert", "delete", "replace"):
                stats["desync"] += 1
                pass  # handled by sentence-structure pass below
                # interior structural mismatches only (both neighbors
                # are equal runs), short spans — these reveal phrase-
                # pattern weight errors
                interior = (0 < oi < len(ops) - 1
                            and ops[oi - 1][0] == "equal"
                            and ops[oi + 1][0] == "equal"
                            and max(i2 - i1, j2 - j1) <= 3)
                if interior and len(desync_samples) < 300:
                    ctx_my = myw[max(0, i1 - 3):i2 + 3]
                    ctx_pin = pw[max(0, j1 - 3):j2 + 3]
                    desync_samples.append((tag, ctx_my, ctx_pin))
        # --- sentence-structure pass: pair aligned terminators ---
        # my terminator token indices (absolute) inside window mapped
        # to pin terminator indices via equal ops
        term_pairs = []
        for tag, i1, i2, j1, j2 in ops:
            if tag != "equal":
                continue
            for k in range(i2 - i1):
                if tok_words[a + i1 + k] in _TERMS:
                    term_pairs.append((a + i1 + k, j1 + k))
        # build equal-token index set for strictness checks
        eq_my = set()
        for tag, i1, i2, j1, j2 in ops:
            if tag == "equal":
                eq_my.update(range(a + i1, a + i2))
        for (mi1, pj1), (mi2, pj2) in zip(term_pairs, term_pairs[1:]):
            pin_sent = pw[pj1 + 1:pj2]
            n_my = mi2 - mi1 - 1
            # strict: same token count, >=80% of my tokens matched
            if not pin_sent or n_my != len(pin_sent):
                continue
            n_eq = sum(1 for k in range(mi1 + 1, mi2) if k in eq_my)
            if n_eq < 0.8 * n_my:
                continue
            parsed = _parse_true_sentence(pin_sent)
            if not parsed:
                continue
            tgram, tnps, tvps = parsed
            b1 = tok_meta[mi1][0]
            b2 = tok_meta[mi2][0]
            lo_m = bisect.bisect_right(marker_pos, b1)
            hi_m = bisect.bisect_left(marker_pos, b2)
            ms = markers[lo_m:hi_m]
            g_ms = [m for m in ms if m[1] == "G"]
            np_ms = [m for m in ms if m[1] == "NP"]
            vp_ms = [m for m in ms if m[1] == "VP"]
            if len(g_ms) != 1:
                continue
            # my structure must agree in counts with the true parse
            if len(np_ms) != len(tnps) or len(vp_ms) != len(tvps):
                pat_constraints["G"].append((g_ms[0][2], tgram))
                continue
            pat_constraints["G"].append((g_ms[0][2], tgram))
            for m, shp in zip(np_ms, tnps):
                pat_constraints["NP"].append((m[2], shp))
            for m, shp in zip(vp_ms, tvps):
                pat_constraints["VP"].append((m[2], shp))
    stats["EXACT"] = exact
    return constraints, located, stats, desync_samples, pat_constraints


def _parse_true_sentence(words):
    """Strict parse of one true sentence (token list, no terminator) ->
    (grammar_pattern, [np shapes], [vp shapes]) or None."""
    VOC = {c: set(w for w, _ in getattr(D, a)) for c, a in CATS.items()}
    def cat_of(w):
        for c in "NJDVXP":
            if w in VOC[c]:
                return c
        return None
    cats_ = [cat_of(w) for w in words]
    if any(c is None for c in cats_):
        return None
    i = 0
    gram = []
    nps, vps = [], []
    def np_(i):
        # longest match of D J N / J J N / J N / N
        for shape, pat in (("D J N", "DJN"), ("J, J N", "JJN"),
                           ("J N", "JN"), ("N", "N")):
            k = len(pat)
            if cats_[i:i + k] == list(pat):
                return i + k, shape
        return None
    def vp_(i):
        for shape, pat in (("X V D", "XVD"), ("X V", "XV"),
                           ("V D", "VD"), ("V", "V")):
            k = len(pat)
            if cats_[i:i + k] == list(pat):
                # "V D J N" is ambiguous: (V D)(J N) == (V)(D J N);
                # "X V D D J N" similar — reject so the constraint
                # stream stays clean
                if shape.endswith("D") and cats_[i + k:i + k + 2] == ["J", "N"]:
                    return "AMBIG"
                if shape in ("V", "X V") and cats_[i + k:i + k + 3] == ["D", "J", "N"]:
                    return "AMBIG"
                return i + k, shape
        return None
    r = np_(0)
    if not r:
        return None
    i = r[0]; gram.append("N"); nps.append(r[1])
    while i < len(words):
        if cats_[i] == "P" and i + 1 < len(words) and words[i + 1] == "the":
            rr = np_(i + 2)
            if not rr:
                return None
            gram.append("P"); nps.append(rr[1]); i = rr[0]
        else:
            rr = vp_(i)
            if rr == "AMBIG":
                return None
            if rr:
                gram.append("V"); vps.append(rr[1]); i = rr[0]
                continue
            rr = np_(i)
            if rr and rr[0] == len(words):
                gram.append("N"); nps.append(rr[1]); i = rr[0]
            else:
                return None
    # note: V-then-NP ambiguity: "V D" vs "V" + "D J N" start — the
    # vp_ longest-match mirrors the generator's own emission, but a
    # true "V" followed by np "D J N" would misparse; accept the
    # ambiguity (counts are constraints, outliers get out-voted)
    return " ".join(gram) + " T", nps, vps


def _pin_char_pos(text, pw, idx):
    # char offset of the idx-th token within the (untruncated) pin text:
    # find sequentially
    pos = 0
    # tokens skipped the first raw token; find each in order
    cur = 0
    for i, w in enumerate(pw[:idx + 1]):
        word0 = w.split(" ")[0]
        f = text.find(word0, cur)
        if f < 0:
            return pos
        pos = f
        cur = f + len(word0)
    return pos


def solve_category(pairs, vocab, max_total=700):
    """pairs: (ratio, word). Filter to known-vocab words, then derive
    order + integer weights."""
    per_word = defaultdict(list)
    for r, w in pairs:
        if w in vocab:
            per_word[w].append(r)
    robust = {}
    for w, rs_ in per_word.items():
        rs_.sort()
        n = len(rs_)
        # trim 2% tails (alignment noise)
        k = int(n * 0.02)
        robust[w] = (rs_[k], rs_[n - 1 - k], n)
    order = sorted(robust.items(), key=lambda kv: kv[1][0])
    conflicts = sum(
        1 for (w1, (a1, b1, _)), (w2, (a2, b2, _2)) in zip(order, order[1:])
        if b1 > a2
    )
    for S in range(len(order), max_total + 1):
        ok = True
        prev_hi = -1
        bounds = []
        for w, (lo_r, hi_r, n) in order:
            va, vb = int(lo_r * S), int(hi_r * S)
            if va <= prev_hi:
                ok = False
                break
            bounds.append((w, va, vb, n))
            prev_hi = vb
        if not ok or not bounds or bounds[-1][2] != S - 1 or bounds[0][1] != 0:
            continue
        if any(bounds[i + 1][1] != bounds[i][2] + 1
               for i in range(len(bounds) - 1)):
            continue
        return ([w for w, *_ in bounds],
                {w: vb - va + 1 for w, va, vb, n in bounds}, S, conflicts)
    return None, None, None, conflicts


def main():
    prefix_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 20
    size = int(prefix_mb * 1024 * 1024)
    pins = sorted(pickle.load(open("/tmp/dbgen_pins.pkl", "rb")))
    pins = [p for p in pins if p[0] < size - 8000]
    print(f"building {prefix_mb} MB tracked prefix; {len(pins)} pins")
    pool, toks = build_tracked(size)
    cons, located, stats, dsamp, pats = align_and_collect(pool, toks, pins)
    print(f"located {located}/{len(pins)} pins; stats {dict(stats)}")
    for t, a, b in dsamp[:25]:
        print(" DSYNC", t, "| my:", " ".join(a), "| pin:", " ".join(b))
    for pc in ("G", "NP", "VP"):
        pairs = pats.get(pc, [])
        from collections import defaultdict as dd
        per = dd(list)
        for r, shp in pairs:
            per[shp].append(r)
        print(f"== pattern {pc}: {len(pairs)} constraints")
        for shp, rs_ in sorted(per.items(), key=lambda kv: sorted(kv[1])[len(kv[1]) // 20]):
            rs_.sort()
            k = int(len(rs_) * 0.05)
            print(f"   {shp:12s} n={len(rs_):5d} [{rs_[k]:.5f}, {rs_[len(rs_)-1-k]:.5f}]")
    vocabs = {k: set(w for w, _ in getattr(D, v)) for k, v in CATS.items()}
    for cat in ("T", "X", "D", "V", "J", "N", "P"):
        pairs = cons.get(cat, [])
        order, weights, S, conflicts = solve_category(pairs, vocabs[cat])
        known = sum(1 for r, w in pairs if w in vocabs[cat])
        print(f"== {cat}: {len(pairs)} constraints ({known} in-vocab), "
              f"conflicts={conflicts}")
        if order is None:
            per_word = defaultdict(list)
            for r, w in pairs:
                if w in vocabs[cat]:
                    per_word[w].append(r)
            for w, rs_ in sorted(per_word.items(),
                                 key=lambda kv: sorted(kv[1])[len(kv[1]) // 50]):
                rs_.sort()
                k = int(len(rs_) * 0.02)
                print(f"   {w:18s} n={len(rs_):5d} "
                      f"[{rs_[k]:.5f}, {rs_[len(rs_)-1-k]:.5f}]")
        else:
            print(f"   SOLVED total={S}")
            for w in order:
                print(f'    ("{w}", {weights[w]}),')


if __name__ == "__main__":
    main()
