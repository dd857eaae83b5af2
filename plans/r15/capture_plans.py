#!/usr/bin/env python3
"""Capture .explain('formatted') for the headline queries into
plans/r15/<query>_<tag>.txt (tag = before/after). Usage:

    python plans/r15/capture_plans.py before [query ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

HEADLINE = [
    "tpch_q01", "tpch_q03", "tpch_q05", "tpch_q06", "tpch_q09",
    "tpch_q13", "tpch_q18", "tpch_q21",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "knn_bruteforce_cosine",
    "events_sessionize", "text_token_stats",
    "cb_groupby_highcard", "cb_regexp_domain_agg",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))

    from glaredb_spark.registry import QUERIES, load_all
    from glaredb_spark.session import get_spark

    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("FATAL")
    load_all()
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        spark.catalog.clearCache()
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
