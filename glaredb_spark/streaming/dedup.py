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
