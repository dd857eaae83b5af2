"""Python UDTF surface — the user-extension analog of the reference's
table-function extensions (SURVEY.md §2.8; extension.rs `ExtensionFunctions
{ table }`, example in examples/ — a Rust extension registers a function
usable in FROM).

Spark 4 Python UDTFs are registered into the session so ``SELECT * FROM
fn(...)`` and ``FROM t, LATERAL fn(t.col)`` work in plain spark.sql —
the same calling convention the reference gives extension table functions.

These are the SLOW PATH (row-at-a-time Python, like any user extension in
any engine): the engine's own table functions (generate_series, read_*,
glob) stay JVM-side via sources/files.py + the SQL pre-binder
(functions/table_sql.py). The UDTFs here exist as the extension MECHANISM
plus two genuinely useful members; heavy per-document fan-out belongs in
mapInPandas (operators/multimodal.py) or JVM explode (dedup shingles).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos INT, ngram STRING")
class TokenNgrams:
    """Token n-grams of a whitespace-tokenized string: the UDTF form of the
    dedup family's JVM shingle expression (operators/dedup.py
    _SHINGLE_EXPR) — equality between the two paths is asserted in tests."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="generate_series BIGINT")
class PySeries:
    """Inclusive-stop integer series (series.rs:84 semantics), the
    canonical extension table function."""

    def eval(self, start: int, stop: int, step: int = 1):  # noqa: D102
        if step is None or step == 0:
            raise ValueError("py_generate_series step must not be zero")
        i = start
        if step > 0:
            while i <= stop:
                yield (i,)
                i += step
        else:
            while i >= stop:
                yield (i,)
                i += step


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("token_ngrams", TokenNgrams)
    spark.udtf.register("py_generate_series", PySeries)
