"""BPE merge training (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al. 2016 — exact rule-sequence match."""

from collections import Counter


def _py_bpe(word_n: dict[str, int], k: int):
    """Reference implementation: same tie-break (max count, then (left,
    right) ascending) and same greedy left-to-right merge."""
    seqs = {w: tuple(list(w) + ["</w>"]) for w in word_n}
    rules = []
    for step in range(1, k + 1):
        pairs: Counter = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += word_n[w]
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((step, left, right, left + right, cnt))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return rules


def test_bpe_matches_python_reference(spark, sf_dir):
    from glaredb_spark.operators.bpe import train_bpe, word_counts
    from glaredb_spark.sources.files import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    wc = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    expected = _py_bpe(wc, 8)
    got = train_bpe(spark, docs, n_merges=8)
    assert got == expected


def test_bpe_merge_handles_overlap(spark):
    """'aaa' under merge (a,a) must give [aa, a] (greedy, no re-scan) —
    the classic overlapping-pair edge."""
    from pyspark.sql import functions as F

    from glaredb_spark.operators.bpe import _merge_in_sym

    df = spark.createDataFrame(
        [(1, ["a", "a", "a", "</w>"])], "n int, sym array<string>"
    )
    out = df.select(_merge_in_sym("a", "a").alias("sym")).collect()[0]["sym"]
    assert out == ["aa", "a", "</w>"]


def test_bpe_query_registered(spark, sf_dir):
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["bpe_train_merges"](spark, sf_dir)
    rows = df.collect()
    assert 1 <= len(rows) <= 8
    assert rows[0]["step"] == 1
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def _py_apply(seq, merges):
    for left, right in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def test_apply_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from glaredb_spark.operators.bpe import apply_merges, train_bpe
    from glaredb_spark.sources.files import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    merges = [(l, r) for _, l, r, _, _ in train_bpe(spark, docs, 6)]
    words = ["lower", "lowest", "newer", "a", ""]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["enc"]
        for r in df.select(
            "word", apply_merges(F.col("word"), merges).alias("enc")
        ).collect()
    }
    for w in words:
        assert got[w] == _py_apply(list(w) + ["</w>"], merges), w


def test_bpe_apply_encode_counts(spark, sf_dir):
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["bpe_apply_encode"](spark, sf_dir)
    rows = df.limit(50).collect()
    assert rows
    # merges only ever shrink the symbol count, never below 2 per word
    assert all(0 < r["n_subwords"] <= r["n_raw_symbols"] for r in rows)
