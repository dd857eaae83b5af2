"""Semantic invariants for the scrub (PII/HTML) and selection
(mean-word-freq / DSIR) operators; exact parity vs DuckDB runs in
test_oracle_parity.py like every registered query."""

import pytest

from glaredb_spark.registry import QUERIES, load_all

load_all()


@pytest.fixture(scope="module")
def pii(spark, sf_dir):
    return QUERIES["text_pii_redact"](spark, sf_dir).collect()


def test_pii_counts_positive(pii):
    assert all(r.n_emails >= 1 and r.n_phones >= 1 and r.n_ips >= 1 for r in pii)


def test_pii_redacted_clean(pii):
    for r in pii:
        assert "@example.com" not in r.redacted
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted
        assert "<IP>" in r.redacted


def test_html_strip_no_markup(spark, sf_dir):
    rows = QUERIES["text_html_strip"](spark, sf_dir).collect()
    for r in rows:
        assert "<" not in r.visible and ">" not in r.visible
        assert "var x" not in r.visible
        assert 0 < r.visible_ratio < 1
        assert r.visible_len == len(r.visible)


def test_mean_word_freq_bounds(spark, sf_dir):
    rows = QUERIES["text_mean_word_freq"](spark, sf_dir).collect()
    # every token occurs at least once corpus-wide → mean_tf >= 1
    assert all(r.mean_tf >= 1.0 for r in rows)
    assert all(r.sum_tf >= r.n_tokens for r in rows)


def test_dsir_targets_english(spark, sf_dir):
    rows = QUERIES["dsir_importance"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.mean_weight)
    avg = {k: sum(v) / len(v) for k, v in by_lang.items()}
    # target = en: English documents must score most target-like
    assert avg["en"] == max(avg.values()), avg


def test_selection_plans_broadcast(spark, sf_dir):
    """The feature/vocab tables must broadcast — the corpus token stream
    is never shuffled by word/bucket (the 100 TB plan)."""
    for name in ("text_mean_word_freq", "dsir_importance"):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_scrub_plans_map_only(spark, sf_dir):
    """Scrub operators shuffle only for the presentation ORDER BY: no
    aggregate or join exchanges in the plan."""
    for name in ("text_pii_redact", "text_html_strip"):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "HashAggregate" not in plan, name


def test_pack_sequences_invariants(spark, sf_dir):
    """Offsets are a gapless concatenation per source; bin ids are
    consistent with offsets."""
    rows = QUERIES["pipeline_pack_sequences"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        expect = 0
        for r in rs:  # already ordered by doc_id
            assert r.start_offset == expect, (src, r.doc_id)
            expect += r.n_tokens
            assert r.first_bin == r.start_offset // 2048
            assert r.straddles == (r.first_bin != r.last_bin)
