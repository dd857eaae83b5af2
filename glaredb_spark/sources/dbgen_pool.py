"""Build dbgen's pseudo-text pool (TPC-H spec §4.2.2.13).

One Lehmer LCG stream (seed 933588178) drives every choice: sentence
pattern, phrase patterns, and word picks — one draw per choice, chosen
by cumulative weight over the dists.dss lists in dbgen_dists.py.
Sentences are emitted space-separated ("... requests. carefully ...")
until the pool reaches POOL_SIZE, then truncated to exactly that size
(10 MiB — the size used by the generator lineage behind the reference
goldens; TPC's original dbgen uses 300 MiB, same walk truncated later).

The LCG sequence itself is precomputed in vectorized chunks
(s_n = s0 * 16807^n mod 2^31-1 via square-and-multiply on index
arrays), so the Python-level work is only the data-dependent grammar
walk. Building takes ~2 s one-time; dbgen_text.py caches the result
on disk keyed by a fingerprint of the dists + builder source.
"""

from __future__ import annotations

import numpy as np

from glaredb_spark.sources import dbgen_dists as D

M = 2147483647
G = 16807
POOL_SEED = 933588178
POOL_SIZE = 10 * 1024 * 1024

_CHUNK = 4_000_000


class _RatioStream:
    """Sequential draw ratios r_n = seed_n / M, precomputed in chunks."""

    def __init__(self, seed: int):
        self.seed = seed
        self.base_n = 0
        self.buf = np.empty(0)
        self.i = 0

    def _refill(self):
        idx = np.arange(self.base_n + 1, self.base_n + _CHUNK + 1,
                        dtype=np.uint64)
        from glaredb_spark.sources.dbgen import pow_mod_vec

        seeds = (np.uint64(self.seed) * pow_mod_vec(idx)) % np.uint64(M)
        self.buf = seeds.astype(np.float64) / float(M)
        self.base_n += _CHUNK
        self.i = 0

    def take(self) -> float:
        if self.i >= len(self.buf):
            self._refill()
        r = self.buf[self.i]
        self.i += 1
        return r


def _dist(entries):
    """(values, cum_weights, total) for cumulative pick: a draw value
    v = floor(r * total) selects the first entry with cum > v."""
    vals = [v for v, _ in entries]
    cum = []
    t = 0
    for _, w in entries:
        t += w
        cum.append(t)
    return vals, cum, t


def _pick(rs, vals, cum, total):
    v = int(rs.take() * total)
    lo, hi = 0, len(cum) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if cum[mid] > v:
            hi = mid
        else:
            lo = mid + 1
    return lo


def build_pool(path: str | None = None, size: int = POOL_SIZE,
               track: bool = False):
    """Generate the pool; write to ``path`` if given. With
    ``track=True`` also return per-token (byte_start, category,
    ratio, word_index) arrays for calibration."""
    rs = _RatioStream(POOL_SEED)
    dists = {
        name: _dist(getattr(D, attr))
        for name, attr in [
            ("G", "GRAMMAR"), ("NP", "NP"), ("VP", "VP"),
            ("N", "NOUNS"), ("V", "VERBS"), ("J", "ADJECTIVES"),
            ("D", "ADVERBS"), ("P", "PREPOSITIONS"),
            ("X", "AUXILIARIES"), ("T", "TERMINATORS"),
        ]
    }
    out = bytearray()
    tracks = [] if track else None

    gvals, gcum, gtot = dists["G"]
    npvals, npcum, nptot = dists["NP"]
    vpvals, vpcum, vptot = dists["VP"]

    word_bytes = {
        k: [w.encode() for w in dists[k][0]]
        for k in ("N", "V", "J", "D", "P", "X", "T")
    }

    def word(cat):
        vals, cum, total = dists[cat]
        r = rs.take()
        v = int(r * total)
        lo, hi = 0, len(cum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] > v:
                hi = mid
            else:
                lo = mid + 1
        if track:
            tracks.append((len(out), ord(cat), r, lo))
        out.extend(word_bytes[cat][lo])
        return lo

    def noun_phrase():
        pat = npvals[_pick(rs, npvals, npcum, nptot)]
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
                word("J")
                out.extend(b",")
            elif sym == "D":
                word("D")
        return pat

    # "J, J N" splits to ["J,", "J", "N"] — handled above
    def verb_phrase():
        pat = vpvals[_pick(rs, vpvals, vpcum, vptot)]
        first = True
        for sym in pat.split(" "):
            if not first:
                out.extend(b" ")
            first = False
            if sym == "V":
                word("V")
            elif sym == "X":
                word("X")
            elif sym == "D":
                word("D")
        return pat

    target = size
    while len(out) < target:
        pat = gvals[_pick(rs, gvals, gcum, gtot)]
        for sym in pat.split(" "):
            if sym == "N":
                noun_phrase()
                out.extend(b" ")
            elif sym == "V":
                verb_phrase()
                out.extend(b" ")
            elif sym == "P":
                word("P")
                out.extend(b" the ")
                noun_phrase()
                out.extend(b" ")
            elif sym == "T":
                # terminator replaces the trailing space
                if out and out[-1] == 0x20:
                    del out[-1]
                word("T")
                out.extend(b" ")

    data = bytes(out[:size])
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(data)
    if track:
        return data, tracks, bytes(out)
    return data
