"""PII redaction and HTML/boilerplate stripping — training-data scrub
operators a large-scale pipeline runs before anything else touches raw
web text.

The fixture corpus is synthetic word-salad, so each operator first
builds a deterministic "dirty" view of the document (emails, phone
numbers, IPs / HTML markup derived from the document's own tokens and
doc_id) identically on both engines, then scrubs it — the oracle gate
therefore exercises the scrub logic on guaranteed-nonzero match counts
instead of vacuously passing on clean text.

Scale: both operators are map-only over documents (regex + string
builtins, all JVM-side, zero shuffles, no Python UDFs). At 100 TB they
ride the parquet scan: no state, no skew sensitivity; every regex below
is shared RE2/Java syntax (no lookaround, no backrefs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

# shared Java/RE2 patterns (single-quoted in DuckDB → no escape munging)
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# deterministic dirty text: first two tokens build an email, doc_id
# builds a phone + ip
_AUG_SQL = (
    "concat(text, ' contact ', string_split(text, ' ')[1], '.', "
    "string_split(text, ' ')[2], '@example.com call 555-', "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' from 10.', "
    "CAST(doc_id % 256 AS VARCHAR), '.0.', "
    "CAST((doc_id * 7) % 256 AS VARCHAR))"
)


def _aug_spark():
    toks = F.split(F.col("text"), " ")
    return F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.element_at(toks, 1),
        F.lit("."),
        F.element_at(toks, 2),
        F.lit("@example.com call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )


@register_query(
    "text_pii_redact",
    oracle=f"""
WITH dirty AS (
  SELECT doc_id, {_AUG_SQL} AS aug FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(
         regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
         '{IP_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(aug,
         '{EMAIL_RE}', '<EMAIL>', 'g'),
         '{IP_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM dirty
ORDER BY doc_id
""",
)
def text_pii_redact(spark, sf_dir):
    """Regex PII scrub (emails / phones / IPv4) with per-category match
    counts. Counts use the pre-redaction text (IPs counted after email
    removal so an address's host part is not double-counted). Map-only;
    the 100 TB plan is scan → project, nothing else."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    aug = docs.select("doc_id", _aug_spark().alias("aug"))
    no_email = F.regexp_replace(F.col("aug"), EMAIL_RE, "<EMAIL>")
    return (
        aug.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("aug"), F.lit(EMAIL_RE), F.lit(0)))
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(F.col("aug"), F.lit(PHONE_RE), F.lit(0)))
            .cast("long")
            .alias("n_phones"),
            F.size(F.regexp_extract_all(no_email, F.lit(IP_RE), F.lit(0)))
            .cast("long")
            .alias("n_ips"),
            F.regexp_replace(
                F.regexp_replace(no_email, IP_RE, "<IP>"),
                PHONE_RE,
                "<PHONE>",
            ).alias("redacted"),
        )
        .orderBy("doc_id")
    )


_HTML_SQL = (
    "concat('<html><head><title>', string_split(text, ' ')[1], "
    "'</title><script>var x = 1;</script></head><body><p>', text, "
    "'</p><div class=\"x\">', string_split(text, ' ')[2], ' &amp; ', "
    "string_split(text, ' ')[3], '</div><!-- note --></body></html>')"
)

_TAG_STEPS_SQL = (
    "trim(regexp_replace(replace(regexp_replace(regexp_replace("
    "regexp_replace(html, '<script>.*?</script>', ' ', 'g'), "
    "'<!--.*?-->', ' ', 'g'), '<[^>]*>', ' ', 'g'), "
    "'&amp;', '&'), '\\s+', ' ', 'g'))"
)


def _strip_spark(html):
    s = F.regexp_replace(html, r"<script>.*?</script>", " ")
    s = F.regexp_replace(s, r"<!--.*?-->", " ")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    s = F.replace(s, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


@register_query(
    "text_html_strip",
    oracle=f"""
WITH pages AS (
  SELECT doc_id, {_HTML_SQL} AS html FROM documents
)
SELECT doc_id,
       CAST(length(html) AS BIGINT) AS html_len,
       {_TAG_STEPS_SQL} AS visible,
       CAST(length({_TAG_STEPS_SQL}) AS BIGINT) AS visible_len,
       CAST(length({_TAG_STEPS_SQL}) AS DOUBLE) / length(html)
         AS visible_ratio
FROM pages
ORDER BY doc_id
""",
)
def text_html_strip(spark, sf_dir):
    """HTML → visible text: drop script blocks and comments, strip tags,
    decode &amp;, collapse whitespace; visible/raw length ratio is the
    classic boilerplate-removal quality signal. Map-only (regex chain in
    one projection), zero shuffles at any scale."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.element_at(toks, 1),
        F.lit("</title><script>var x = 1;</script></head><body><p>"),
        F.col("text"),
        F.lit('</p><div class="x">'),
        F.element_at(toks, 2),
        F.lit(" &amp; "),
        F.element_at(toks, 3),
        F.lit("</div><!-- note --></body></html>"),
    )
    pages = docs.select("doc_id", html.alias("html"))
    visible = _strip_spark(F.col("html"))
    return pages.select(
        "doc_id",
        F.length("html").cast("long").alias("html_len"),
        visible.alias("visible"),
        F.length(visible).cast("long").alias("visible_len"),
        (
            F.length(visible).cast("double") / F.length("html")
        ).alias("visible_ratio"),
    ).orderBy("doc_id")
