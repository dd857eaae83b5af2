"""Contamination check: planted 13-gram overlap is detected, clean docs
are not flagged, and the check is exact (no false positives on 12-gram
overlap)."""


def test_planted_contamination(spark):
    from glaredb_spark.operators.contamination import contamination_check

    shared13 = " ".join(f"w{i}" for i in range(13))
    docs = spark.createDataFrame(
        [
            # contaminated: contains the exact benchmark 13-gram
            (1, "prefix " + shared13 + " suffix"),
            # clean: shares only 12 of the 13 words in sequence
            (2, "prefix " + " ".join(f"w{i}" for i in range(12)) + " different"),
            # clean: same words, different order (no exact n-gram)
            (3, " ".join(f"w{i}" for i in reversed(range(13)))),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "intro " + shared13 + " outro")], "doc_id long, text string"
    )
    hits = {r.doc_id: r for r in contamination_check(docs, bench).collect()}
    assert set(hits) == {1}
    assert hits[1].n_shared_ngrams == 1
    assert hits[1].first_benchmark_doc == 100
