"""Streaming deduplication — exact dedup over a document stream with
cross-micro-batch state (applyInPandasWithState).

North-star extension (the reference has no streaming subsystem): the
training-data-pipeline shape where documents arrive continuously and each
must be admitted exactly once. State is keyed by content digest; the first
document seen for a digest is admitted (``is_first = true``), every later
arrival — same batch or any later batch — is flagged a duplicate of the
recorded first.

Scale notes: state ∝ distinct digests, partitioned across executors by
digest hash (RocksDB-backed on a cluster); each micro-batch touches only
the digests present in it. At 100 TB the digest is 16 bytes + one long per
distinct document — the same memory shape as the batch exact-dedup shuffle,
amortized over the stream's lifetime. For bounded state add a watermark-
driven timeout (admit-again-after-horizon semantics) — deliberately not
defaulted here because exactly-once admission is the usual contract.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("is_first", T.BooleanType()),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType([T.StructField("first_doc_id", T.LongType())])


def _dedup_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    first = state.get[0] if state.exists else None
    out_ids, out_first, out_flag = [], [], []
    for pdf in pdfs:
        # deterministic within-batch order: lowest doc_id wins the slot
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            if first is None:
                first = doc_id
                out_flag.append(True)
            else:
                out_flag.append(doc_id == first)
            out_ids.append(doc_id)
            out_first.append(first)
    state.update((first,))
    yield pd.DataFrame(
        {
            "doc_id": out_ids,
            "digest": [key[0]] * len(out_ids),
            "first_doc_id": out_first,
            "is_first": out_flag,
        }
    )


def dedup_exact_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Admit-once streaming exact dedup: one output row per arriving doc,
    flagged is_first/duplicate against all previously seen content."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming NEAR-dup candidates — MinHash band-LSH buckets with state
# ---------------------------------------------------------------------------
MINHASH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("is_first", T.BooleanType()),
    ]
)

MINHASH_STATE_SCHEMA = T.StructType([T.StructField("first_doc_id", T.LongType())])


def _bucket_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    first = state.get[0] if state.exists else None
    ids, firsts, flags = [], [], []
    for pdf in pdfs:
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            if first is None:
                first = doc_id
                flags.append(True)
            else:
                flags.append(doc_id == first)
            ids.append(doc_id)
            firsts.append(first)
    state.update((first,))
    yield pd.DataFrame(
        {
            "band": [int(key[0])] * len(ids),
            "band_key": [key[1]] * len(ids),
            "doc_id": ids,
            "first_doc_id": firsts,
            "is_first": flags,
        }
    )


def minhash_candidates_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming MinHash band-LSH: each arriving doc is hashed into the same
    (band, band_key) buckets as the batch dedup_minhash_lsh operator (same
    shingles, same 16 permutations, same 4 bands — operators/dedup.py), and
    every bucket keeps its first-seen doc in state. A doc colliding with a
    bucket seen in ANY earlier micro-batch emits a candidate row pairing it
    with that representative.

    The signature is computed PER ROW with scalar expressions
    (array_min over transformed hash arrays) — no pre-state shuffle, so the
    plan has exactly one stateful operator, which Structured Streaming's
    append mode requires. Candidate pairs still need exact Jaccard
    verification downstream, exactly like the batch LSH path."""
    from glaredb_spark.operators.dedup import (
        A,
        B,
        BANDS,
        NUM_HASHES,
        P31,
        ROWS_PER_BAND,
        _SHINGLE_EXPR,
        _hash64,
    )

    toks = (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("t"))
        .withColumn("hs", F.array_distinct(F.transform(F.expr(_SHINGLE_EXPR), _hash64)))
        # batch parity: docs too short to shingle produce no posting rows in
        # the batch path, so they must not all collide in an md5('') bucket
        .filter(F.size("hs") > 0)
    )
    def _perm(j: int):
        # closure factory, NOT a two-arg lambda: F.transform would treat a
        # second parameter as the element-index Column
        return F.array_min(
            F.transform("hs", lambda h: (F.lit(A[j]) * h + F.lit(B[j])) % F.lit(P31))
        ).alias(f"mh{j}")

    sigs = toks.select("doc_id", *[_perm(j) for j in range(NUM_HASHES)])
    band_keys = [
        F.md5(
            F.concat_ws(
                "-",
                *[
                    F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
        )
        for b in range(BANDS)
    ]
    exploded = sigs.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    )
    return exploded.groupBy("band", "band_key").applyInPandasWithState(
        _bucket_update,
        outputStructType=MINHASH_OUTPUT_SCHEMA,
        stateStructType=MINHASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
