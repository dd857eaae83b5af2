"""Distributed BPE merge training (byte-pair encoding vocabulary learning).

Training-data pipeline family (BASELINE.json north star): the tokenizer
side of an LLM data pipeline. ``text_bpe_token_count`` (operators/text.py)
*applies* a tokenizer heuristic; this module *learns* merge rules from the
corpus — the Sennrich et al. 2016 algorithm (arXiv:1508.07909):

1. aggregate the corpus to a (word, count) table — after this step the
   working set is vocabulary-sized, never corpus-sized again;
2. repeat k times: count adjacent symbol pairs weighted by word count,
   take the most frequent pair (ties → lexicographic, deterministic),
   merge it greedily left-to-right inside every word's symbol sequence.

Scale design (100 TB corpus):
- The corpus is touched ONCE (split+explode → groupBy word). Every
  iteration then runs over the distinct-word table — bounded by |vocab|
  (≈ millions), independent of corpus bytes.
- Per iteration: one map-side pair explosion + groupBy(pair) partial-agg
  shuffle of ≤ |vocab|·avg_word_len rows of 3 scalars, then a 1-row
  driver fetch of the argmax (the merge rule IS driver state — same
  pattern as the k-means centroid fetch, operators/semantic.py), then a
  map-only greedy re-merge via a JVM higher-order fold (no Python UDF).
- The symbol-sequence table is re-persisted per iteration and the
  previous one unpersisted: lineage stays O(1) per round instead of
  accumulating k nested transforms.

Determinism: counts are exact integers; argmax ties break on
(left, right) ascending; the greedy fold is left-to-right — identical to
the reference Python implementation in tests/test_bpe.py.

Non-SQL-expressible (iterative argmax → rewrite loop), so the registered
query is a rows-only driver check; correctness is pytest-gated against a
pure-Python BPE on the same word counts (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_wide

N_MERGES = 8


def word_counts(docs: DataFrame) -> DataFrame:
    """Corpus → (word, n) — the single corpus-sized pass."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """Each word becomes its character sequence plus an end-of-word
    marker (the classic formulation: merges can't cross word ends, and
    final merges ending in the marker represent whole-word tokens)."""
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    return words.select(
        "n", F.concat(chars, F.array(F.lit("</w>"))).alias("sym")
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: map-side explode
    of size-1 structs per word, partial-agg combine before the shuffle."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("sym") - 1),
        lambda i: F.struct(
            F.element_at("sym", i).alias("left"),
            F.element_at("sym", i + 1).alias("right"),
        ),
    )
    return (
        syms.select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_in_sym(left: str, right: str):
    """Greedy left-to-right merge of (left, right) → left||right inside
    the ``sym`` array, as a pure-JVM aggregate fold (no Python UDF).

    The accumulator carries (out, skip): when position i matched the
    pair, position i+1 was already consumed."""
    merged = left + right
    n = F.size("sym")

    def step(acc, i):
        cur = F.element_at("sym", i)
        nxt = F.element_at("sym", i + 1)
        is_pair = (
            (i < n) & (cur == F.lit(left)) & (nxt.eqNullSafe(F.lit(right)))
        )
        return (
            F.when(
                acc.skip,
                F.struct(
                    acc.out.alias("out"), F.lit(False).alias("skip")
                ),
            )
            .when(
                is_pair,
                F.struct(
                    F.concat(acc.out, F.array(F.lit(merged))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc.out, F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("skip"),
    )
    return F.aggregate(
        F.sequence(F.lit(1), n), init, step, lambda acc: acc.out
    )


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns
    [(step, left, right, merged, pair_count), ...]."""
    syms = _init_symbols(word_counts(docs)).persist()
    syms.count()  # materialize before the loop re-derives from it
    rules: list[tuple[int, str, str, str, int]] = []
    try:
        for step_no in range(1, n_merges + 1):
            best = (
                _pair_counts(syms)
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
            rules.append((step_no, left, right, left + right, int(cnt)))
            new_syms = syms.select(
                "n", _merge_in_sym(left, right).alias("sym")
            ).persist()
            new_syms.count()
            syms.unpersist()
            syms = new_syms
    finally:
        syms.unpersist()
    return rules


@register_query("bpe_train_merges")  # iterative: rows-only driver check
def bpe_train_merges(spark, sf_dir):
    """The learned merge table as a DataFrame (tiny by construction:
    n_merges rows). Oracle-exempt — the argmax→rewrite loop is not one
    SQL statement; exact-match correctness vs a pure-Python reference
    implementation is pytest-gated (tests/test_bpe.py)."""
    docs = load_wide(spark, sf_dir, "documents")
    rules = train_bpe(spark, docs)
    return spark.createDataFrame(
        rules, "step int, left string, right string, merged string, pair_count bigint"
    ).orderBy("step")


def apply_merges(word_col, merges: list[tuple[str, str]]):
    """Column expression: encode a word column with the learned merge
    list, sequentially in rank order (each merge greedily left-to-right
    everywhere — subword-nmt's per-operation semantics, mirrored exactly
    by the Python reference in tests/test_bpe.py).

    Why an Arrow-batched pandas UDF and not k chained JVM folds: each
    ``aggregate`` fold re-references its input expression several times
    (current symbol, lookahead, size), so chaining k merges nests the
    whole prior tree ~5× per level — at k=8 the analyzer hits its
    iteration cap on a ~5^8-node expression. The UDF closes over the
    tiny merge table (broadcast-by-construction) and keeps the plan
    flat; per-batch work is a straight loop — the same pattern this repo
    uses for every genuinely iterative per-row kernel (vector.py).
    Map-only, no shuffle."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rules = list(merges)

    def one(w):
        if w is None:
            return None
        seq = list(w) + ["</w>"]
        for left, right in rules:
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which pandas_udf can't resolve for locally-imported names
    encode = pandas_udf(
        lambda words: words.map(one), T.ArrayType(T.StringType())
    )
    return encode(word_col)


@register_query("bpe_apply_encode")  # rows-only: merges learned iteratively
def bpe_apply_encode(spark, sf_dir):
    """Tokenize documents with the merges learned by ``train_bpe``:
    per document, subword count after encoding vs raw symbol count.
    The merge table is tiny driver state closed over by the Arrow
    encoder (broadcast-by-construction); encoding is map-only — zero
    shuffles before the per-doc aggregation (grouping on doc_id, the
    scan's natural key). Exact-match vs the Python reference encoder is
    pytest-gated (tests/test_bpe.py)."""
    docs = load_wide(spark, sf_dir, "documents")
    merges = [(l, r) for _, l, r, _, _ in train_bpe(spark, docs)]
    per_word = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .select(
            "doc_id",
            (F.length("word") + 1).alias("n_raw"),
            F.size(apply_merges(F.col("word"), merges)).alias("n_sub"),
        )
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("n_raw").cast("long").alias("n_raw_symbols"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .orderBy("doc_id")
    )


_PAIR_STATS_ORACLE = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM (
    SELECT w, unnest(range(1, length(w))) AS i
    FROM words WHERE length(w) >= 2
  )
)
SELECT pair, count(*) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 20
"""


@register_query("bpe_pair_stats", oracle=_PAIR_STATS_ORACLE)
def bpe_pair_stats(spark, sf_dir):
    """The top-20 adjacent character pairs over the corpus's words — the
    pair-frequency statistic BPE training's first iteration maximizes
    (Sennrich et al. 2016 §3.2), as one declarative aggregation.

    Scale: split+explode is map-only; the pair explosion multiplies rows
    by avg word length but each row is a 2-char string, and the groupBy
    partial-aggregates map-side down to |alphabet|² keys before the
    exchange; top-k is TakeOrdered (no global sort). Zero Python in the
    hot path."""
    docs = load_wide(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(20)
    )


# --- fixed-rule encoder (oracle-gated) ---------------------------------------

# A constant merge table gates the ENCODER kernel (apply_merges) bit-
# exactly against DuckDB at any scale factor: training is iterative
# (rows-only by design), but encoding with known rules is a pure
# function of the text, and DuckDB can express greedy left-to-right
# merging as a sentinel-delimited replace chain (see _FIXED_ORACLE).
FIXED_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"), ("t", "h"), ("th", "e"), ("a", "n"),
    ("i", "n"), ("s", "</w>"), ("e", "r"), ("o", "n"),
]


def _fixed_encode_oracle() -> str:
    """DuckDB SQL equivalent of apply_merges(FIXED_MERGES): each word
    becomes a chr(2)<sym>chr(3)-delimited symbol string (one symbol per
    character plus '</w>'); each merge rule is one replace() of the
    adjacent delimited pair — non-overlapping left-to-right replacement
    is exactly the greedy merge because the sentinels make symbol
    boundaries unambiguous and non-shared. Subword count = number of
    chr(2) sentinels."""
    s = "s0"
    for i, (left, right) in enumerate(FIXED_MERGES, start=1):
        pat = f"chr(2) || '{left}' || chr(3) || chr(2) || '{right}' || chr(3)"
        rep = f"chr(2) || '{left}{right}' || chr(3)"
        s = f"replace({s}, {pat}, {rep})"
    return f"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
), wrapped AS (
  SELECT doc_id, length(w) + 1 AS n_raw,
    regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g')
      || chr(2) || '</w>' || chr(3) AS s0
  FROM words
), merged AS (
  SELECT doc_id, n_raw,
    length({s}) - length(replace({s}, chr(2), '')) AS n_sub
  FROM wrapped
)
SELECT doc_id,
  CAST(sum(n_raw) AS BIGINT) AS n_raw_symbols,
  CAST(sum(n_sub) AS BIGINT) AS n_subwords
FROM merged GROUP BY doc_id ORDER BY doc_id
"""


@register_query("bpe_encode_fixed", oracle=_fixed_encode_oracle())
def bpe_encode_fixed(spark, sf_dir):
    """Encode every document with the constant FIXED_MERGES rule table —
    the same Arrow-batched greedy encoder bpe_apply_encode uses, but
    with rules that don't depend on training, so the result is
    oracle-checkable bit-exactly (the gate the trained path can't have).

    Scale: identical to bpe_apply_encode — the merge table is tiny
    driver state closed over by the encoder UDF, encoding is map-only,
    and the per-doc aggregation groups on the scan's natural key."""
    docs = load_wide(spark, sf_dir, "documents")
    per_word = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .select(
            "doc_id",
            (F.length("word") + 1).alias("n_raw"),
            F.size(
                apply_merges(F.col("word"), FIXED_MERGES)
            ).alias("n_sub"),
        )
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("n_raw").cast("long").alias("n_raw_symbols"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .orderBy("doc_id")
    )
