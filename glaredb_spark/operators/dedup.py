"""Deduplication operators for large-scale training-data pipelines.

Five dedup families (BASELINE.json north star), each designed for 100 TB:

- exact           — hash-groupBy on a content digest; one shuffle of digests.
- n-gram Jaccard  — inverted-index blocking on rare shingles (no O(n²)
                    cross join); candidate volume bounded by Σ df² over
                    shingles with df ≤ DF_MAX (hot shingles dropped, the
                    standard stop-shingle technique).
- MinHash + LSH   — 16 permutations → 4 bands × 4 rows; only docs sharing a
                    band key are paired (equi-join, shuffle on band key).
- SimHash         — 32-bit signature; 8-bit band blocking for Hamming pairs.
- embedding cosine— sign-LSH bucketing on leading dimensions, exact cosine
                    verification inside buckets only.

Cross-engine determinism: all hashes derive from md5 (identical in Spark and
DuckDB) reduced to int64 via hex→int; permutations are (a·h + b) mod p with
p = 2³¹−1, products bounded by 2⁶² (no int64 overflow in either engine);
Jaccard/cosine are single divisions of exact integers.
"""

from __future__ import annotations

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import functions as F

from glaredb_spark.functions import vector as V
from glaredb_spark.operators.similarity import o_band_code as _o_band_code
from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables, load_wide

P31 = 2147483647  # 2^31 - 1 (prime)
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = 4
# fixed, documented permutation constants (odd multipliers, arbitrary seeds)
A = [769, 1031, 1543, 2053, 3079, 6151, 12289, 24593,
     49157, 98317, 196613, 393241, 786433, 1572869, 3145739, 6291469]
B = [12345, 23456, 34567, 45678, 56789, 67890, 78901, 89012,
     90123, 13579, 24680, 35791, 46802, 57913, 68024, 79135]

MINHASH_JACCARD_MIN = 0.5
NGRAM_JACCARD_MIN = 0.7
DF_MAX = 20  # stop-shingle document-frequency cutoff for blocking
COSINE_DUP_MIN = 0.35
SIMHASH_MAX_HAMMING = 2


# -- shared shingle/token machinery -----------------------------------------

def _tokens_df(spark, sf_dir):
    docs = load_wide(spark, sf_dir, "documents")
    return docs.select("doc_id", F.split("text", " ").alias("t"))


_SHINGLE_EXPR = (
    "CASE WHEN size(t) < 3 THEN array() "
    "ELSE transform(sequence(1, size(t) - 2), i -> "
    "concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))) END"
)

O_SHINGLES = (
    "CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len(t) - 1), i -> "
    "concat_ws(' ', t[i], t[i + 1], t[i + 2])) END"
)
O_TOK = "SELECT doc_id, string_split(text, ' ') AS t FROM documents"


def _shingles_df(spark, sf_dir):
    """(doc_id, shingles: array<string>) — token 3-grams."""
    return _tokens_df(spark, sf_dir).select(
        "doc_id", F.expr(_SHINGLE_EXPR).alias("shingles")
    )


def _hash64(col):
    """md5-derived int64 in [0, 2^31-2] — identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % F.lit(P31)
    )


def _o_hash64(expr: str) -> str:
    return f"(CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT) % {P31})"


def _hashed_sets(sets):
    """(doc_id, hs: array<long>) — shingle sets hashed to int64 so the
    verification join ships 8-byte elements instead of ~20-byte strings.
    Both engines hash identically, so Jaccard values are identical."""
    return sets.select(
        "doc_id",
        F.array_distinct(F.transform("s", lambda x: _hash64(x))).alias("hs"),
    )


def _hashed_shingle_sets(spark, sf_dir, *, with_sigs: bool = False):
    """Kernel applied to the full documents fixture — see hashed_sets_of."""
    return hashed_sets_of(
        load_wide(spark, sf_dir, "documents").select("doc_id", "text"),
        with_sigs=with_sigs,
    )


def hashed_sets_of(docs, *, with_sigs: bool = False):
    """(doc_id, hs: array<long>) — SORTED distinct md5-hashes of the token
    3-gram shingles of any (doc_id, text) DataFrame, computed in ONE Arrow
    pass per batch (guide §4).

    Why this replaces the expression pipeline for the two headline dedup
    queries: the JVM route evaluated `transform(sequence(...), i ->
    concat_ws(...))` and the per-shingle md5 chain as INTERPRETED
    higher-order functions (outside whole-stage codegen, ~µs per element
    over ~10⁶ shingle evaluations), and re-hashed the same shingles on
    both the signature and verification branches. Here tokenize → 3-gram
    → md5 → distinct → sort runs once per document in C-speed Python
    (hashlib md5), and every consumer shares the persisted 8-byte hash
    sets. Interleaved A/B at sf0.1 on the same host: minhash 7.09 s →
    1.57 s, ngram 5.21 s → 2.15 s (min of 5 alternating samples each),
    value-identical rows.

    Hash identity with the SQL/oracle form is exact:
    `int(md5(s).hexdigest()[:15], 16) % P31` ==
    `conv(substring(md5(s), 1, 15), 16, 10) % P31` (same utf-8 bytes,
    same 60-bit prefix, same modulus), and Python's `split(' ')` keeps
    empty fields exactly like Spark/DuckDB's single-space split. The
    sorted distinct set is order-insensitively consumed everywhere
    (min-aggregates, array_intersect sizes), and doubles as ngram's
    ascending prefix order. Scale: map-only, no shuffle; per-task state
    is one document's shingle set.

    with_sigs=True (r15 second pass) additionally emits the 16 MinHash
    signature values as `sig array<bigint>` (null for shingle-less docs),
    computed over the SAME hash set in one vectorized numpy step:
    min_j((A[j]·h + B[j]) mod P31). Equivalence with the expression form
    (explode hs → groupBy doc_id → 16 MIN aggregates) is exact: products
    are < 2⁶² (no int64 overflow on either side), numpy's mod on
    non-negative int64 matches the JVM's `%`, and a doc with an empty hs
    has NO row after the explode — mirrored by emitting null and
    filtering size(hs) > 0 at the consumer. Folding the signatures into
    the kernel removes the explode of ~10⁶ hashed-shingle rows, the
    16-expression partial aggregation and its exchange — which the band
    self-join's plan previously evaluated ONCE PER SIDE off the cached
    sets (asserted by the sig-parity test in test_shingle_kernel.py)."""

    def gen(batches):
        import hashlib

        import numpy as np

        import pyarrow as pa

        md5 = hashlib.md5
        if with_sigs:
            a_np = np.asarray(A, dtype=np.int64)
            b_np = np.asarray(B, dtype=np.int64)
        for b in batches:
            ids = b.column("doc_id").to_pylist()
            out = []
            sig_out = []
            for text in b.column("text").to_pylist():
                t = (text or "").split(" ")
                if len(t) < 3:
                    out.append([])
                    sig_out.append(None)
                    continue
                hs = {
                    int(md5(" ".join(t[i:i + 3]).encode()).hexdigest()[:15], 16)
                    % P31
                    for i in range(len(t) - 2)
                }
                srt = sorted(hs)
                out.append(srt)
                if with_sigs:
                    arr = np.asarray(srt, dtype=np.int64)
                    sig_out.append(
                        ((arr[:, None] * a_np + b_np) % P31).min(axis=0)
                    )
            arrays = [
                pa.array(ids, pa.int64()),
                pa.array(out, pa.list_(pa.int64())),
            ]
            names = ["doc_id", "hs"]
            if with_sigs:
                arrays.append(pa.array(sig_out, pa.list_(pa.int64())))
                names.append("sig")
            yield pa.RecordBatch.from_arrays(arrays, names)

    schema = "doc_id bigint, hs array<bigint>"
    if with_sigs:
        schema += ", sig array<bigint>"
    return docs.mapInArrow(gen, schema)


O_HASHED_SETS = (
    "SELECT doc_id, list_distinct(list_transform(s, sh -> "
    + _o_hash64("sh")
    + ")) AS hs FROM sets"
)


def _verify_pairs(
    cand, hsets, threshold, *, broadcast_sets: bool = False, arrow: bool = False
):
    """Exact Jaccard over candidate pairs.

    |A∪B| is computed ARITHMETICALLY (a + b − |A∩B|; arrays are distinct)
    instead of materializing array_union — half the per-pair array work,
    byte-identical results. broadcast_sets=True additionally broadcasts
    the per-doc set table (2.8× on a COLD single verification pass at
    sf0.1) but was measured SLOWER under warm repeated execution (the
    per-run broadcast build through the driver outweighs the cached
    shuffle it replaces) — so the default stays the AQE-planned join,
    which is also the only shape that scales past broadcastable set
    tables.

    arrow=True (the high-pair-volume path, r15): one mapInArrow kernel
    per batch replaces the per-pair pandas UDF. The old kernel converted
    every hs array to a numpy OBJECT per row and looped
    np.intersect1d pair by pair (~181k python iterations at sf0.1); now
    the batch's list columns flatten zero-copy and ALL intersections
    vectorize at once — each element becomes a (row << 31 | value) int64
    key (values are md5 % P31 < 2³¹, so the packing is lossless), one
    global intersect1d per side pair finds the common keys, and a
    bincount on (key >> 31) yields every pair's |A∩B| with no per-pair
    loop. Counts are the same exact integers; jaccard is the same
    int-over-int double division; the ≥ threshold filter moves in-kernel
    (fewer rows serialized out, same rows survive)."""
    maybe_b = F.broadcast if broadcast_sets else (lambda df: df)
    x = maybe_b(
        hsets.select(
            F.col("doc_id").alias("doc1"),
            F.col("hs").alias("s1"),
            F.size("hs").alias("n1"),
        )
    )
    y = maybe_b(
        hsets.select(
            F.col("doc_id").alias("doc2"),
            F.col("hs").alias("s2"),
            F.size("hs").alias("n2"),
        )
    )
    joined = cand.join(x, "doc1").join(y, "doc2")
    if arrow:
        id_t = hsets.schema["doc_id"].dataType.simpleString()
        thr = float(threshold)

        def gen(batches):
            import numpy as np

            import pyarrow as pa
            import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import in workers

            for b in batches:
                if b.num_rows == 0:
                    continue
                d1 = b.column(b.schema.get_field_index("doc1"))
                d2 = b.column(b.schema.get_field_index("doc2"))
                s1 = b.column(b.schema.get_field_index("s1"))
                s2 = b.column(b.schema.get_field_index("s2"))
                l1 = pa.compute.list_value_length(s1).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                l2 = pa.compute.list_value_length(s2).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                v1 = np.asarray(s1.flatten(), dtype=np.int64)
                v2 = np.asarray(s2.flatten(), dtype=np.int64)
                rid = np.arange(b.num_rows, dtype=np.int64)
                k1 = (np.repeat(rid, l1) << 31) | v1
                k2 = (np.repeat(rid, l2) << 31) | v2
                common = np.intersect1d(k1, k2, assume_unique=True)
                cnt = np.bincount(
                    common >> 31, minlength=b.num_rows
                ).astype(np.float64)
                jac = cnt / (l1 + l2 - cnt)
                keep = jac >= thr
                if keep.any():
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(
                                d1.to_numpy(zero_copy_only=False)[keep],
                                d1.type,
                            ),
                            pa.array(
                                d2.to_numpy(zero_copy_only=False)[keep],
                                d2.type,
                            ),
                            pa.array(jac[keep], pa.float64()),
                        ],
                        ["doc1", "doc2", "jaccard"],
                    )

        return joined.select("doc1", "doc2", "s1", "s2").mapInArrow(
            gen, f"doc1 {id_t}, doc2 {id_t}, jaccard double"
        )
    i = F.size(F.array_intersect("s1", "s2")).cast("long")
    jac = F.col("_i").cast("double") / (F.col("n1") + F.col("n2") - F.col("_i"))
    return (
        joined.withColumn("_i", i)
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# exact dedup — hash-groupBy on content digest
# ---------------------------------------------------------------------------
@register_query(
    "dedup_exact",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY source
ORDER BY source
""",
)
def dedup_exact(spark, sf_dir):
    docs = load_wide(spark, sf_dir, "documents")
    return (
        docs.select("source", "doc_id", F.md5("text").alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_dup_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


def _blocked_jaccard_pairs(postings, threshold):
    """Blocked per-bucket Jaccard verification (r15 third pass — the
    embedding/semdedup blocked-verification pattern applied to ngram).

    ``postings`` is the rare-prefix posting stream WITH each document's
    full hash set attached: (h, doc_id, n, hs). Documents sharing a rare
    prefix hash h form one bucket (|bucket| <= DF_MAX by construction);
    each doc's set ships ONCE PER BUCKET it posts into, instead of once
    per candidate PAIR. At sf0.1 that is ~24 MB through one exchange vs
    ~143 MB of pair-attached arrays through the Python boundary (171,722
    distinct candidate pairs x two 52-element sets); at scale the gap is
    asymptotic — posting volume is linear in corpus size while pair
    volume grows with df² per hash (guide §2.3 "shuffle keys and
    metadata instead of payloads", §8).

    The kernel computes EVERY bucket pair's full |A∩B| by vectorized
    co-occurrence counting, no per-pair loop: flatten all buckets in the
    batch, tag each set element with (bucket << 31 | value) — both
    < 2³¹, lossless — sort once, expand each equal-key group's index
    combinations (group size <= DF_MAX, so per-size np.triu templates
    cover it), then one np.unique over packed (lo_instance << 31 | hi)
    keys yields every pair's shared-element count. A pair sharing only
    the bucket hash itself still appears (h is in both sets), so the
    candidate set is exactly the old self-join's: both docs carry h in
    their prefix, a.doc_id < b.doc_id, size-ratio prune — the latter two
    applied in-kernel with the same float64 ops the JVM filter used.
    jaccard = cnt/(n1+n2-cnt) is the same exact-int float64 division as
    `_verify_pairs`; survivors are bit-identical (proven at all three
    SFs + oracle parity; equality test in tests/test_blocked_verify.py).
    Cross-bucket duplicates carry the same jaccard and resolve in the
    caller's groupBy-min, exactly as the old multi-prefix duplicates
    did. Interleaved A/B at sf0.1, two sessions: faster 12/12
    alternating pairs (min 2.06→1.79 s and 2.42→1.98 s)."""
    thr = float(threshold)

    buckets = postings.groupBy("h").agg(
        F.collect_list(F.struct("doc_id", "n", "hs")).alias("rows")
    )
    id_t = postings.schema["doc_id"].dataType.simpleString()

    def gen(batches):
        import numpy as np

        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import in workers

        for b in batches:
            if b.num_rows == 0:
                continue
            col = b.column(b.schema.get_field_index("rows"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lens = pa.compute.list_value_length(col).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = col.flatten()
            id_pa = flat.field("doc_id").type
            doc_ids = flat.field("doc_id").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ns = flat.field("n").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            hs = flat.field("hs")
            if isinstance(hs, pa.ChunkedArray):
                hs = hs.combine_chunks()
            hs_lens = pa.compute.list_value_length(hs).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            vals = np.asarray(hs.flatten(), dtype=np.int64)
            n_inst = len(doc_ids)
            inst = np.repeat(np.arange(n_inst, dtype=np.int64), hs_lens)
            bkt = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)[inst]
            key = (bkt << 31) | vals  # bucket idx and md5%P31 both < 2^31
            order = np.argsort(key, kind="stable")
            k_s = key[order]
            inst_s = inst[order]
            starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
            sizes = np.diff(np.r_[starts, len(k_s)])
            pi_parts, pj_parts = [], []
            max_m = int(sizes.max()) if len(sizes) else 0
            for m in range(2, max_m + 1):  # group size <= DF_MAX
                st = starts[sizes == m]
                if not len(st):
                    continue
                iu, ju = np.triu_indices(m, k=1)
                pi_parts.append(inst_s[st[:, None] + iu[None, :]].ravel())
                pj_parts.append(inst_s[st[:, None] + ju[None, :]].ravel())
            if not pi_parts:
                continue
            pi = np.concatenate(pi_parts)
            pj = np.concatenate(pj_parts)
            lo = np.minimum(pi, pj)
            hi = np.maximum(pi, pj)
            upk, cnt = np.unique((lo << 31) | hi, return_counts=True)
            lo = upk >> 31
            hi = upk & ((1 << 31) - 1)
            d1, d2 = doc_ids[lo], doc_ids[hi]
            swap = d1 > d2
            d1s = np.where(swap, d2, d1)
            d2s = np.where(swap, d1, d2)
            n1, n2 = ns[lo], ns[hi]
            mn = np.minimum(n1, n2).astype(np.float64)
            mx = np.maximum(n1, n2).astype(np.float64)
            jac = cnt.astype(np.float64) / (n1 + n2 - cnt)
            keep = (mn >= thr * mx) & (jac >= thr)
            if keep.any():
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(d1s[keep], id_pa),
                        pa.array(d2s[keep], id_pa),
                        pa.array(jac[keep], pa.float64()),
                    ],
                    ["doc1", "doc2", "jaccard"],
                )

    return buckets.mapInArrow(
        gen, f"doc1 {id_t}, doc2 {id_t}, jaccard double"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup — prefix-filtered inverted-index blocking
# (Bayardo/AllPairs), exact verification
#
# Prefix filter (lossless): under ANY global element order, two sets with
# J(A,B) >= θ must share an element among the first |A| − ⌈θ·|A|⌉ + 1
# elements of each (if not, the overlap is < θ/(1+θ)·(|A|+|B|), forcing
# J < θ). We use ascending hash order. Only prefixes are indexed — posting
# volume drops ~(1−θ)x and candidate pairs quadratically so — on top of
# the df∈[2, DF_MAX] stop-shingle cutoff and the size-ratio prune.
# ---------------------------------------------------------------------------
_O_PFX_LEN = f"CAST(n - ceil({NGRAM_JACCARD_MIN} * n) + 1 AS BIGINT)"


@register_query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH tok AS ({O_TOK}),
raw AS (SELECT doc_id, list_distinct({O_SHINGLES}) AS s FROM tok),
sets AS (SELECT doc_id, hs, len(hs) AS n FROM (
  SELECT doc_id, list_sort(list_distinct(list_transform(s, sh ->
    {_o_hash64('sh')}))) AS hs FROM raw)),
pfx AS (SELECT doc_id, n, unnest(hs[1 : {_O_PFX_LEN}]) AS h FROM sets),
rare AS (SELECT h FROM pfx GROUP BY h
         HAVING COUNT(*) BETWEEN 2 AND {DF_MAX}),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM pfx a JOIN pfx b ON a.h = b.h AND a.doc_id < b.doc_id
         JOIN rare r ON a.h = r.h
         WHERE least(a.n, b.n) >= {NGRAM_JACCARD_MIN} * greatest(a.n, b.n)),
scored AS (
  SELECT doc1, doc2,
         CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
           / (x.n + y.n - len(list_intersect(x.hs, y.hs))) AS jaccard
  FROM cand JOIN sets x ON doc1 = x.doc_id JOIN sets y ON doc2 = y.doc_id)
SELECT doc1, doc2, jaccard FROM scored
WHERE jaccard >= {NGRAM_JACCARD_MIN}
ORDER BY doc1, doc2
""",
    cache_plan=True,
)
def dedup_ngram_jaccard(spark, sf_dir):
    # hs is the SORTED distinct hash set: one array serves as the prefix
    # source (ascending hash = the global order) and the verification
    # set. r15: hs comes from the Arrow kernel (_hashed_shingle_sets)
    # instead of interpreted JVM HOFs — identical values, 2.4x measured
    # (see the kernel's docstring).
    #
    # r15 fourth pass: ONE persist instead of two — the posting rows
    # carry hs through the prefix explode, so the separate `sets` persist
    # level and the broadcast join that re-attached hs to the rare
    # postings both disappear (guide §2.4: the exploded rows already HAD
    # the array in hand; re-joining it back was a leftover of the
    # pair-attached design). The fat persist stores hs once per posting
    # row (~41 MB at sf0.1 vs ~3 MB sets + ~4 MB postings before) but the
    # rare count scans only the pruned `h` column off the columnar cache,
    # and the bucket exchange ships exactly what the old attach-join
    # produced. Candidate stream `p` is row-identical by construction.
    pfx_len = (
        F.size("hs") - F.ceil(F.lit(NGRAM_JACCARD_MIN) * F.size("hs")) + 1
    ).cast("int")
    pfx = (
        _hashed_shingle_sets(spark, sf_dir)
        .select(
            "doc_id",
            F.size("hs").alias("n"),
            "hs",
            F.explode(F.slice("hs", F.lit(1), pfx_len)).alias("h"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rare = (
        pfx.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(2, DF_MAX))
        .select("h")
    )
    # r15 third pass: BLOCKED verification replaces the posting self-join
    # + two array-attaching joins + per-pair kernel. Each doc's full hash
    # set ships once per rare prefix hash it posts into (the bucket); the
    # kernel computes every bucket pair's exact |A∩B| by vectorized
    # co-occurrence counting and applies the a.doc_id < b.doc_id, size-
    # ratio and jaccard >= θ filters in-kernel — same candidate set, same
    # float64 ops, bit-identical survivors (see _blocked_jaccard_pairs).
    #
    # NO distinct on candidates (unchanged reasoning): a pair appears once
    # per shared rare prefix hash (~1.05x multiplicity measured), and
    # deduplicating the verified survivors (a few hundred rows) is far
    # cheaper than a distinct shuffle over the full candidate stream.
    # Duplicates verify to the SAME jaccard, so min() is a no-op
    # value-wise.
    p = pfx.join(rare, "h").select("h", "doc_id", "n", "hs")
    return (
        _blocked_jaccard_pairs(p, NGRAM_JACCARD_MIN)
        .groupBy("doc1", "doc2")
        .agg(F.min("jaccard").alias("jaccard"))
        .orderBy("doc1", "doc2")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _minhash_aggs():
    """16 min-aggregates over permuted shingle hashes (no row blowup)."""
    return [
        F.min((F.lit(A[j]) * F.col("h") + F.lit(B[j])) % F.lit(P31)).alias(f"mh{j}")
        for j in range(NUM_HASHES)
    ]


def _o_minhash_cols() -> str:
    return ", ".join(
        f"MIN(({A[j]} * h + {B[j]}) % {P31}) AS mh{j}" for j in range(NUM_HASHES)
    )


def _band_key(b: int):
    cols = [F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string") for r in range(ROWS_PER_BAND)]
    return F.md5(F.concat_ws("-", *cols))


def _o_band_key(b: int) -> str:
    cols = ", ".join(
        f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )
    return f"md5(concat_ws('-', {cols}))"


@register_query(
    "dedup_minhash_lsh",
    oracle=f"""
WITH tok AS ({O_TOK}),
sets AS (SELECT doc_id, list_distinct({O_SHINGLES}) AS s FROM tok),
posting AS (SELECT DISTINCT doc_id, unnest(s) AS sh FROM sets),
hashed AS (SELECT doc_id, {_o_hash64('sh')} AS h FROM posting),
sigs AS (SELECT doc_id, {_o_minhash_cols()} FROM hashed GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_o_band_key(b)} AS band_key FROM sigs" for b in range(BANDS))}
),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key
          AND a.doc_id < b.doc_id),
hsets AS ({O_HASHED_SETS}),
scored AS (
  SELECT doc1, doc2,
         CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
           / len(list_distinct(x.hs || y.hs)) AS jaccard
  FROM cand JOIN hsets x ON doc1 = x.doc_id JOIN hsets y ON doc2 = y.doc_id)
SELECT doc1, doc2, jaccard FROM scored
WHERE jaccard >= {MINHASH_JACCARD_MIN}
ORDER BY doc1, doc2
""",
    cache_plan=True,
)
def dedup_minhash_lsh(spark, sf_dir):
    # r15: one persisted Arrow-hashed set per doc feeds BOTH the signature
    # aggregation and the verification join — the old plan re-hashed every
    # shingle on each branch through interpreted HOF/md5 chains and pushed
    # a no-op distinct over the widest (string) stream. Identical values,
    # 4.5x measured (see _hashed_shingle_sets).
    #
    # r15 second pass: the 16 signature minima now come out of the SAME
    # kernel pass (with_sigs=True) instead of explode(hs) → groupBy →
    # 16 MIN aggregates — the band self-join evaluated that agg chain
    # once per side off the cache (2 Generate + 4 HashAggregate +
    # 2 Exchange in the old plan, see plans/r15). Docs with empty hs had
    # no exploded rows, hence the size(hs) > 0 filter. Values identical
    # (see hashed_sets_of docstring + the sig-parity test).
    hsets = _hashed_shingle_sets(spark, sf_dir, with_sigs=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = hsets.filter(F.size("hs") > 0).select(
        "doc_id",
        *[
            F.element_at("sig", j + 1).alias(f"mh{j}")
            for j in range(NUM_HASHES)
        ],
    )
    # one band row per (doc, band) via a single explode — a 4-way union
    # would recompute the signature aggregation per branch
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[_band_key(b) for b in range(BANDS)])
        ).alias("band", "band_key"),
    )
    # distinct IS kept here (unlike the ngram path): band-key collisions
    # make a tiny candidate stream (near-dups only), so the distinct is
    # cheap and skipping it measured SLOWER (extra post-verify shuffle)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    return _verify_pairs(cand, hsets, MINHASH_JACCARD_MIN).orderBy(
        "doc1", "doc2"
    )


# ---------------------------------------------------------------------------
# SimHash — 32-bit signatures + banded Hamming pairing
# ---------------------------------------------------------------------------

def _simhash_df(spark, sf_dir, weighted: bool = False):
    """32-bit SimHash signatures. weighted=True uses term-frequency weights
    (Charikar's weighted form): every token OCCURRENCE votes ±1 per bit,
    which is exactly tf-weighting with integer sums — deterministic, and the
    standard choice for real corpora where repeated terms carry signal.

    r15: computed by a map-only Arrow kernel (guide §2.1/§4), the
    _hashed_shingle_sets pattern — the expression form exploded ~|corpus|
    × tokens rows and shuffled them through a 32-conditional-sum
    aggregation; here tokenize → md5 → bit votes → sign threshold runs
    per document inside one mapInArrow pass, NO explode and NO shuffle.
    Hash identity with the SQL/oracle form is exact (same md5 60-bit
    prefix % P31 — see _hashed_shingle_sets); bit votes are exact
    integer sums; ties (s_i ≥ 0 → bit set) match the JVM CASE. The
    unweighted form hashes each DISTINCT TOKEN (so two distinct tokens
    colliding to one hash still vote twice, exactly like
    array_distinct + explode). Bit parity with the expression form is
    asserted in tests/test_blocked_verify.py; oracle parity unchanged."""
    docs = load_wide(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        import hashlib

        import numpy as np

        import pyarrow as pa

        md5 = hashlib.md5
        shifts = np.arange(32, dtype=np.int64)
        weights = (1 << shifts).astype(np.int64)
        for b in batches:
            ids = b.column(b.schema.get_field_index("doc_id")).to_numpy(
                zero_copy_only=False
            )
            out = np.empty(len(ids), dtype=np.int64)
            for i, text in enumerate(
                b.column(b.schema.get_field_index("text")).to_pylist()
            ):
                toks = (text or "").split(" ")
                if not weighted:
                    toks = set(toks)
                hs = np.fromiter(
                    (
                        int(md5(t.encode()).hexdigest()[:15], 16) % P31
                        for t in toks
                    ),
                    dtype=np.int64,
                )
                bits = (hs[:, None] >> shifts) & 1
                votes = (2 * bits - 1).sum(axis=0)
                out[i] = int(weights[votes >= 0].sum())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(out, pa.int64())],
                ["doc_id", "simhash"],
            )

    return docs.mapInArrow(gen, "doc_id bigint, simhash bigint")


def _o_simhash(weighted: bool = False) -> str:
    distinct = "" if weighted else "DISTINCT "
    return f"""
tok AS ({O_TOK}),
words AS (SELECT {distinct}doc_id, unnest(t) AS w FROM tok),
hashed AS (SELECT doc_id, {_o_hash64('w')} AS h FROM words),
bitsums AS (SELECT doc_id,
  {", ".join(f"SUM(CASE WHEN (h // {2**i}) % 2 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(32))}
  FROM hashed GROUP BY doc_id),
sigs AS (SELECT doc_id,
  CAST({" + ".join(f"(CASE WHEN s{i} >= 0 THEN {2**i} ELSE 0 END)" for i in range(32))} AS BIGINT) AS simhash
  FROM bitsums)
"""


_O_SIMHASH = _o_simhash(False)


@register_query(
    "dedup_simhash",
    oracle=f"""
WITH {_O_SIMHASH}
SELECT doc_id, simhash FROM sigs ORDER BY doc_id
""",
)
def dedup_simhash(spark, sf_dir):
    return _simhash_df(spark, sf_dir).orderBy("doc_id")


@register_query(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_O_SIMHASH},
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, simhash, {k} AS band, (simhash // {2**(8*k)}) % 256 AS band_val FROM sigs" for k in range(4))}
),
cand AS (SELECT DISTINCT a.doc_id AS doc1, a.simhash AS sh1,
                b.doc_id AS doc2, b.simhash AS sh2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id)
SELECT doc1, doc2, CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sh1, sh2)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc1, doc2
""",
)
def dedup_simhash_pairs(spark, sf_dir):
    sigs = _simhash_df(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    ((F.col("simhash") / F.lit(2 ** (8 * k))).cast("long") % 256)
                    for k in range(4)
                ]
            )
        ).alias("band", "band_val"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("a.simhash").alias("sh1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("b.simhash").alias("sh2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))).cast("long")
    return (
        cand.select("doc1", "doc2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc1", "doc2")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup — banded multi-probe sign-LSH + exact verification
# (VERDICT r1 fix: the fixed 2^8 single-bucket design had ~2% recall at the
# fixture threshold and quadratic candidate volume at scale; knobs now come
# from similarity.lsh_params — see that module + SCALE.md for the math).
# ---------------------------------------------------------------------------
DEDUP_R = 2  # oracle-pinned; == lsh_params at the fixture regime, see tests
DEDUP_BANDS = 2

_O_DEDUP_CODE = (
    "CASE band "
    + " ".join(
        f"WHEN {b} THEN {_o_band_code('embedding', b, DEDUP_R)}"
        for b in range(DEDUP_BANDS)
    )
    + " END"
)
_O_DEDUP_PROBES = (
    "[code" + "".join(f", xor(code, {1 << d})" for d in range(DEDUP_R)) + "]"
)


@register_query(
    "dedup_embedding_cosine",
    oracle=f"""
WITH bands AS (
  SELECT vec_id, band, CAST({_O_DEDUP_CODE} AS BIGINT) AS code
  FROM embeddings, (SELECT UNNEST(range({DEDUP_BANDS})) AS band) b),
px AS (SELECT vec_id, band, UNNEST({_O_DEDUP_PROBES}) AS code FROM bands),
cand AS (
  SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
  FROM px x JOIN bands y ON x.band = y.band AND x.code = y.code
  WHERE x.vec_id < y.vec_id)
SELECT v1, v2, {V.o_cosine('a.embedding', 'b.embedding')} AS cosine
FROM cand JOIN embeddings a ON a.vec_id = v1
          JOIN embeddings b ON b.vec_id = v2
WHERE {V.o_cosine('a.embedding', 'b.embedding')} >= {COSINE_DUP_MIN}
ORDER BY v1, v2
""",
)
def dedup_embedding_cosine(spark, sf_dir):
    emb = load_wide(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(
        emb, COSINE_DUP_MIN, r=DEDUP_R, n_bands=DEDUP_BANDS
    ).orderBy("v1", "v2")


def lsh_candidate_pairs(
    emb,
    r: int,
    n_bands: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Distinct (v1 < v2) candidate pairs whose r-bit band codes are within
    Hamming 1 in at least one of n_bands bands (probe side = smaller id's
    side by symmetry of the Hamming ball)."""
    from glaredb_spark.operators.similarity import band_code_cols, probe_code_arrays

    codes = band_code_cols(emb_col, n_bands, r)
    bands = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.array(*codes)).alias("band", "code"),
    )
    px = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.array(*probe_code_arrays(codes, r))).alias("band", "probes"),
    ).select("vec_id", "band", F.explode("probes").alias("code"))
    return (
        px.alias("x")
        .join(bands.alias("y"), ["band", "code"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("v1"), F.col("y.vec_id").alias("v2"))
        .distinct()
    )


def embedding_dup_pairs(
    emb,
    threshold: float,
    *,
    r: int | None = None,
    n_bands: int | None = None,
    n_rows: int | None = None,
    recall: float = 0.9,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """All pairs with exact cosine >= threshold among banded multi-probe
    sign-LSH candidates. Knobs default to lsh_params(|corpus|, threshold,
    recall).

    r15 BLOCKED verification (guide §2.2/§4): the old plan exploded the
    candidate PAIRS (at the fixture's weak threshold ~94% of all N² pairs
    survive blocking) and shipped two 64-dim arrays per pair through two
    joins and a per-pair Arrow UDF — ~1.9M pair-array rows dominated the
    query. Now each vector ships ONCE per band into its (band, code)
    bucket (members = exact codes, probers = Hamming-1 multi-probe codes),
    and one mapInArrow kernel per bucket computes the prober×member
    scaled-int dot matrix in numpy, filters cosine >= threshold and the
    (prober_id < member_id) orientation inside the kernel, and emits only
    the surviving pairs. Candidate SET is unchanged (a's probe hits b's
    exact code in some band ⇔ their codes are within Hamming 1 there —
    exactly the old px⋈bands join); cross-band duplicates resolve in a
    final groupBy over the few surviving rows, where the old plan ran
    distinct over the full candidate stream. Numerics are bit-identical:
    same per-element half-away rounding before the sum, same one-sqrt
    norms, same dot/(n1*n2) op order (vector.scaled_cross_dots /
    scaled_self_norms).

    Scale: shuffle volume is |corpus|·bands·(r+2) vector rows (vs ~Σ
    bucket² pair rows); per-task state is one bucket's matrices — bounded
    by the LSH design (bucket ≈ N/2^r with r sized by lsh_params), the
    standard blocked-verification trade."""
    from glaredb_spark.operators.similarity import (
        band_code_cols,
        lsh_params,
        probe_code_arrays,
    )

    if r is None or n_bands is None:
        if n_rows is None:
            n_rows = emb.count()
        r, n_bands = lsh_params(n_rows, threshold, recall, dim)
    codes = band_code_cols(emb_col, n_bands, r)
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")
    )
    members = base.select(
        F.lit(0).alias("role"),
        "vec_id",
        "embedding",
        F.posexplode(F.array(*codes)).alias("band", "code"),
    )
    probers = (
        base.select(
            F.lit(1).alias("role"),
            "vec_id",
            "embedding",
            F.posexplode(F.array(*probe_code_arrays(codes, r))).alias(
                "band", "probes"
            ),
        )
        .select("role", "vec_id", "embedding", "band", F.explode("probes").alias("code"))
    )
    buckets = (
        members.unionByName(probers)
        .groupBy("band", "code")
        .agg(F.collect_list(F.struct("role", "vec_id", "embedding")).alias("rows"))
    )
    id_type = base.schema["vec_id"].dataType.simpleString()
    thr = float(threshold)

    def gen(batches):
        import numpy as np

        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import in workers

        from glaredb_spark.functions.vector import (
            flat_matrix,
            scaled_cross_dots,
            scaled_self_norms,
        )

        for b in batches:
            col = b.column(b.schema.get_field_index("rows"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lens = pa.compute.list_value_length(col).to_numpy(
                zero_copy_only=False
            )
            flat = col.flatten()
            roles = flat.field("role").to_numpy(zero_copy_only=False)
            ids = flat.field("vec_id").to_numpy(zero_copy_only=False)
            mat, _ = flat_matrix(flat.field("embedding"))
            nrm = scaled_self_norms(mat)
            v1s, v2s, cs = [], [], []
            s = 0
            for ln in lens:
                e = s + int(ln)
                rl = roles[s:e]
                p_idx = np.nonzero(rl == 1)[0] + s
                m_idx = np.nonzero(rl == 0)[0] + s
                s = e
                if not len(p_idx) or not len(m_idx):
                    continue
                D = scaled_cross_dots(mat[p_idx], mat[m_idx])
                C = D / np.outer(nrm[p_idx], nrm[m_idx])
                keep = (ids[p_idx][:, None] < ids[m_idx][None, :]) & (
                    C >= thr
                )
                pi, mi = np.nonzero(keep)
                if len(pi):
                    v1s.append(ids[p_idx][pi])
                    v2s.append(ids[m_idx][mi])
                    cs.append(C[pi, mi])
            if v1s:
                id_pa = flat.field("vec_id").type
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(v1s), id_pa),
                        pa.array(np.concatenate(v2s), id_pa),
                        pa.array(np.concatenate(cs), pa.float64()),
                    ],
                    ["v1", "v2", "cosine"],
                )

    pairs = buckets.mapInArrow(
        gen, f"v1 {id_type}, v2 {id_type}, cosine double"
    )
    # cross-band duplicates carry the SAME cosine (same pair, same arrays):
    # min() is value-neutral and runs over only the verified survivors
    return pairs.groupBy("v1", "v2").agg(F.min("cosine").alias("cosine"))


@register_query(
    "dedup_simhash_weighted",
    oracle=f"""
WITH {_o_simhash(True)}
SELECT doc_id, simhash FROM sigs ORDER BY doc_id
""",
)
def dedup_simhash_weighted(spark, sf_dir):
    """tf-weighted SimHash signatures (every token occurrence votes) —
    the weighted Charikar form for corpora where term repetition matters."""
    return _simhash_df(spark, sf_dir, weighted=True).orderBy("doc_id")


# ---------------------------------------------------------------------------
# chunk-level (paragraph) exact dedup — remove repeated passages globally
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 10


@register_query(
    "dedup_paragraph_exact",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, u.i AS ci,
         array_to_string(
           toks[(u.i - 1) * {CHUNK_TOKENS} + 1 : (u.i - 1) * {CHUNK_TOKENS} + {CHUNK_TOKENS}],
           ' ') AS chunk
  FROM t, LATERAL (
    SELECT unnest(range(1, 1 + CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS INT))) AS i
  ) u
), o1 AS (
  SELECT chunk, min(doc_id) AS od FROM c GROUP BY chunk
), o2 AS (
  SELECT c.chunk, c.doc_id AS od, min(c.ci) AS oci
  FROM c JOIN o1 ON c.chunk = o1.chunk AND c.doc_id = o1.od
  GROUP BY c.chunk, c.doc_id
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN c.doc_id = o2.od AND c.ci = o2.oci
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN c.doc_id = o2.od AND c.ci = o2.oci
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM c JOIN o2 ON c.chunk = o2.chunk
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)
def dedup_paragraph_exact(spark, sf_dir):
    """Passage-level exact dedup (the paragraph-dedup step of C4/Dolma-style
    pipelines): documents are cut into fixed 10-token chunks (the fixture
    corpus has no newlines, so token windows stand in for paragraphs — with
    real text the splitter is `split(text, '\\n\\n')` and everything below
    is unchanged), every chunk that appears anywhere else in the corpus is
    dropped except its first occurrence (smallest (doc_id, chunk_idx)),
    and the per-document kept/dropped counts come back for auditing.

    Scale: one shuffle on the chunk text (groupBy chunk → min owner), an
    equi-join on chunk (owner side arrives pre-partitioned from its agg;
    the probe side shuffles once — AQE broadcasts the owner table when it
    fits, as it does at fixture scale), then a groupBy doc_id over
    ~|corpus| chunk rows. No windows over the full corpus, no driver-side
    state; at 100 TB chunk keys can be md5-hashed first to bound shuffle
    width (identical machinery to dedup_exact)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK_TOKENS)).cast("int")
    chunks = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n_chunks),
                    lambda i: F.array_join(
                        F.slice(toks, (i - 1) * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
                    ),
                )
            ).alias("ci0", "chunk"),
        )
        .select("doc_id", (F.col("ci0") + 1).alias("ci"), "chunk")
    )
    owner = chunks.groupBy("chunk").agg(F.min(F.struct("doc_id", "ci")).alias("o"))
    return (
        chunks.join(owner, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(
                F.when(
                    (F.col("doc_id") == F.col("o.doc_id"))
                    & (F.col("ci") == F.col("o.ci")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
            F.sum(
                F.when(
                    (F.col("doc_id") == F.col("o.doc_id"))
                    & (F.col("ci") == F.col("o.ci")),
                    0,
                ).otherwise(1)
            )
            .cast("long")
            .alias("n_dropped"),
        )
        .orderBy("doc_id")
    )
