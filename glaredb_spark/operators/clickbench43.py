"""The full ClickBench canonical 43-query suite (q00–q42).

Reference: bench/clickbench/single/q00.bench–q42.bench and the
slt/clickbench/single suite (44 files), run by the reference against the
first 10 000 rows of the real ClickBench `hits` dataset
(`submodules/testdata/clickbench/single/hits_truncated.parquet`,
test_bin/integration_slt.rs:355-362). That binary is NOT present in this
environment (the testdata submodule is not checked out), and its SLT
goldens encode aggregates of the real data — unsynthesizable. So, as with
the r2-era cb_* shapes, the canonical QUERIES run here against a
deterministic hits-shaped fixture (~200k rows, seeded), and correctness is
gated by running the SAME query through DuckDB over the SAME fixture —
the repo's standard oracle contract, which checks the engine, not the
dataset.

Faithfulness notes:
- Query text is the reference's, with three mechanical adaptations:
  (1) `epoch(EventTime)` → each engine's int-seconds→timestamp function;
  (2) regex backreference syntax (`$1` Spark / `\\1` DuckDB) in q28;
  (3) deterministic-comparison guards: every `ORDER BY ... LIMIT` gets
      the group keys appended as tiebreakers, q17's bare LIMIT gets an
      ORDER BY, aggregates get explicit aliases, and sums/extracts are
      cast to BIGINT/INT so both engines agree on result width. These
      change neither the plan shape nor the work done — only which of
      several equally-valid top-k row sets is returned.
- The fixture plants the constants the parameterized queries probe
  (UserID 435090932899640449, URLHash 2868770270353813622, RefererHash
  3594120000172545465, CounterID 62, July 2013) so q19/q36–q42 return
  non-trivial results, and skews distributions so HAVING COUNT(*) >
  100000 (q27/q28) keeps live groups at fixture scale.

Scale: every query is scan → (pushed filter) → partial+final aggregate →
TakeOrdered; count-distincts expand to two-level aggregates; no joins, no
Python. The same plans at 100 TB shuffle only group keys + partial states.
"""

from __future__ import annotations

import os

from glaredb_spark.registry import register_query

_FIXTURE = "/root/repo/tests/fixtures/clickbench/hits.parquet"
_GEN_VERSION = "v1"


def ensure_hits_fixture() -> str:
    """Deterministic, seeded 200k-row hits-shaped parquet (idempotent)."""
    stamp = _FIXTURE + ".generated"
    if os.path.exists(stamp) and open(stamp).read().strip() == _GEN_VERSION:
        return _FIXTURE
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 200_000
    rng = np.random.RandomState(2013)
    z = (rng.zipf(1.4, n) - 1).astype(np.int64)  # shared skew driver
    z2 = (rng.zipf(1.6, n) - 1).astype(np.int64)
    watch = (rng.permutation(n) + 10_000_000).astype(np.int64)
    # mostly small UserIDs so SUM(UserID) stays inside int64 (Spark's
    # avg sums integral inputs in long); q19's probed huge constant is
    # planted on exactly 15 rows (15 * 4.35e17 < 2^63)
    user = 1_000 + (z % 30_000)
    user[np.flatnonzero(z % 97 == 0)[:15]] = 435090932899640449
    counter = np.where(
        rng.rand(n) < 0.65, 62, rng.randint(1, 500, n)
    ).astype(np.int32)
    day = np.where(
        rng.rand(n) < 0.8,
        rng.randint(0, 31, n),                 # July 2013
        rng.randint(-20, 51, n),               # spill into June/August
    )
    base_epoch = 1372636800  # 2013-07-01 00:00:00 UTC
    secs = rng.randint(0, 86400, n)
    event_time = (base_epoch + day * 86400 + secs).astype(np.int64)
    event_date = np.datetime64("2013-07-01") + day.astype("timedelta64[D]")
    region = (z % 200).astype(np.int32)
    ip_pool = rng.randint(-(2**31), 2**31 - 1, 5000).astype(np.int64)
    client_ip = ip_pool[z % 5000].astype(np.int32)
    resolution = rng.choice(
        np.array([1366, 1920, 1024, 768, 360, 414, 1536, 2560], np.int16),
        n,
        p=[0.3, 0.25, 0.12, 0.1, 0.1, 0.05, 0.05, 0.03],
    )
    phrase_live = rng.rand(n) >= 0.7
    phrases = np.where(
        phrase_live, np.char.add("phrase ", (z % 2000).astype(str)), ""
    )
    search_engine = np.where(phrase_live, (z % 5) + 1, 0).astype(np.int16)
    adv = np.where(rng.rand(n) < 0.85, 0, rng.randint(1, 11, n)).astype(
        np.int16
    )
    url_kind = rng.rand(n)
    urls = np.where(
        url_kind < 0.05,
        "",
        np.where(
            url_kind < 0.20,
            np.char.add("http://google.com/search?q=", (z % 5000).astype(str)),
            np.char.add("http://example.com/p", (z % 30_000).astype(str)),
        ),
    )
    titles = np.where(
        rng.rand(n) < 0.1,
        np.char.add("Google result ", (z % 1000).astype(str)),
        np.char.add("Title ", (z % 10_000).astype(str)),
    )
    ref_kind = rng.rand(n)
    referers = np.where(
        ref_kind < 0.15,
        "",
        np.where(
            ref_kind < 0.72,  # one domain holds >100k rows (q28 HAVING)
            np.char.add(
                "http://www.bigdomain.ru/path", (z % 20_000).astype(str)
            ),
            np.char.add(
                np.char.add(
                    "https://www.domain", (z2 % 300).astype(str)
                ),
                np.char.add(".com/p", (z % 1000).astype(str)),
            ),
        ),
    )
    is_refresh = (rng.rand(n) < 0.1).astype(np.int16)
    is_link = (rng.rand(n) < 0.15).astype(np.int16)
    is_download = (rng.rand(n) < 0.05).astype(np.int16)
    dont_count = (rng.rand(n) < 0.08).astype(np.int16)
    trafic = rng.choice(np.array([-1, 0, 1, 2, 3, 5, 6, 8], np.int16), n)
    mobile_phone = (z % 6).astype(np.int16)
    mobile_model = np.where(
        rng.rand(n) < 0.8, "", np.char.add("Model-", (z % 40).astype(str))
    )
    win_w = (200 + rng.randint(0, 150, n)).astype(np.int16)
    win_h = (300 + rng.randint(0, 120, n)).astype(np.int16)
    os_col = (z % 20).astype(np.int16)
    # deterministic content hashes (python's hash() is per-process
    # randomized — md5 prefix instead), then plant the probed constants
    import hashlib

    def _h64(arr):
        return np.array(
            [
                int.from_bytes(
                    hashlib.md5(s.encode()).digest()[:8], "little"
                )
                & 0x7FFFFFFFFFFFFFFF
                for s in arr
            ],
            np.int64,
        )

    url_hash = _h64(urls)
    ref_hash = _h64(referers)
    july = (day >= 0) & (day <= 30)
    m41 = (counter == 62) & july & (is_refresh == 0) & (dont_count == 0)
    idx41 = np.flatnonzero(m41)[:13_000]
    url_hash[idx41] = 2868770270353813622
    # spread (w, h) so q41's OFFSET 10000 still has rows behind it
    win_w[idx41] = (200 + np.arange(len(idx41)) % 150).astype(np.int16)
    win_h[idx41] = (300 + (np.arange(len(idx41)) // 150) % 120).astype(
        np.int16
    )
    m40 = (
        (counter == 62) & july & (is_refresh == 0)
        & np.isin(trafic, (-1, 6))
    )
    ref_hash[np.flatnonzero(m40)[:4000]] = 3594120000172545465

    table = pa.table(
        {
            "WatchID": pa.array(watch),
            "Title": pa.array(titles.tolist(), pa.string()),
            "EventTime": pa.array(event_time),
            "EventDate": pa.array(event_date),
            "CounterID": pa.array(counter),
            "ClientIP": pa.array(client_ip),
            "RegionID": pa.array(region),
            "UserID": pa.array(user),
            "OS": pa.array(os_col),
            "URL": pa.array(urls.tolist(), pa.string()),
            "Referer": pa.array(referers.tolist(), pa.string()),
            "IsRefresh": pa.array(is_refresh),
            "SearchEngineID": pa.array(search_engine),
            "SearchPhrase": pa.array(phrases.tolist(), pa.string()),
            "AdvEngineID": pa.array(adv),
            "IsLink": pa.array(is_link),
            "IsDownload": pa.array(is_download),
            "DontCountHits": pa.array(dont_count),
            "TraficSourceID": pa.array(trafic),
            "ResolutionWidth": pa.array(resolution),
            "MobilePhone": pa.array(mobile_phone),
            "MobilePhoneModel": pa.array(mobile_model.tolist(), pa.string()),
            "WindowClientWidth": pa.array(win_w),
            "WindowClientHeight": pa.array(win_h),
            "URLHash": pa.array(url_hash),
            "RefererHash": pa.array(ref_hash),
        }
    )
    os.makedirs(os.path.dirname(_FIXTURE), exist_ok=True)
    pq.write_table(table, _FIXTURE)
    with open(stamp, "w") as fh:
        fh.write(_GEN_VERSION)
    return _FIXTURE


# --- the 43 canonical texts, engine-parameterized -------------------------
# {H} = hits relation; {TS} = int-seconds -> timestamp; {R1} = regex
# backreference for group 1. Aliases/casts/tiebreakers per module docstring.

_HITS_COLS = [
    "WatchID", "Title", "EventTime", "EventDate", "CounterID", "ClientIP",
    "RegionID", "UserID", "OS", "URL", "Referer", "IsRefresh",
    "SearchEngineID", "SearchPhrase", "AdvEngineID", "IsLink", "IsDownload",
    "DontCountHits", "TraficSourceID", "ResolutionWidth", "MobilePhone",
    "MobilePhoneModel", "WindowClientWidth", "WindowClientHeight",
    "URLHash", "RefererHash",
]
# q23's SELECT * with the DATE column cast (see q06 note)
_ALLCOLS = ", ".join(
    "CAST(EventDate AS TIMESTAMP) AS EventDate" if c == "EventDate" else c
    for c in _HITS_COLS
)

_Q29_SUMS = ", ".join(
    f"CAST(SUM(ResolutionWidth + {k}) AS BIGINT) AS s{k}" for k in range(90)
).replace("ResolutionWidth + 0", "ResolutionWidth")

_CB43 = {
    "q00": "SELECT COUNT(*) AS c FROM {H}",
    "q01": "SELECT COUNT(*) AS c FROM {H} WHERE AdvEngineID <> 0",
    "q02": "SELECT CAST(SUM(AdvEngineID) AS BIGINT) AS s, COUNT(*) AS c, "
           "AVG(ResolutionWidth) AS a FROM {H}",
    # exact-integer sum (both engines) divided once — avoids each
    # engine's own double-accumulation order for avg over huge int64s
    "q03": "SELECT CAST(SUM(UserID) AS DOUBLE) / COUNT(*) AS a FROM {H}",
    "q04": "SELECT COUNT(DISTINCT UserID) AS u FROM {H}",
    "q05": "SELECT COUNT(DISTINCT SearchPhrase) AS p FROM {H}",
    # DATE outputs are cast to TIMESTAMP: Spark DATE crosses to pandas as
    # python date objects while DuckDB DATE arrives as datetime64 — the
    # comparator (like the driver's formatter) treats those as different
    # classes; midnight timestamps carry identical information
    "q06": "SELECT CAST(MIN(EventDate) AS TIMESTAMP) AS mn, "
           "CAST(MAX(EventDate) AS TIMESTAMP) AS mx FROM {H}",
    "q07": "SELECT AdvEngineID, COUNT(*) AS c FROM {H} "
           "WHERE AdvEngineID <> 0 GROUP BY AdvEngineID "
           "ORDER BY c DESC, AdvEngineID",
    "q08": "SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM {H} "
           "GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10",
    "q09": "SELECT RegionID, CAST(SUM(AdvEngineID) AS BIGINT) AS s, "
           "COUNT(*) AS c, AVG(ResolutionWidth) AS a, "
           "COUNT(DISTINCT UserID) AS u FROM {H} GROUP BY RegionID "
           "ORDER BY c DESC, RegionID LIMIT 10",
    "q10": "SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM {H} "
           "WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel "
           "ORDER BY u DESC, MobilePhoneModel LIMIT 10",
    "q11": "SELECT MobilePhone, MobilePhoneModel, "
           "COUNT(DISTINCT UserID) AS u FROM {H} "
           "WHERE MobilePhoneModel <> '' "
           "GROUP BY MobilePhone, MobilePhoneModel "
           "ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10",
    "q12": "SELECT SearchPhrase, COUNT(*) AS c FROM {H} "
           "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
           "ORDER BY c DESC, SearchPhrase LIMIT 10",
    "q13": "SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM {H} "
           "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
           "ORDER BY u DESC, SearchPhrase LIMIT 10",
    "q14": "SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM {H} "
           "WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase "
           "ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10",
    "q15": "SELECT UserID, COUNT(*) AS c FROM {H} GROUP BY UserID "
           "ORDER BY c DESC, UserID LIMIT 10",
    "q16": "SELECT UserID, SearchPhrase, COUNT(*) AS c FROM {H} "
           "GROUP BY UserID, SearchPhrase "
           "ORDER BY c DESC, UserID, SearchPhrase LIMIT 10",
    "q17": "SELECT UserID, SearchPhrase, COUNT(*) AS c FROM {H} "
           "GROUP BY UserID, SearchPhrase "
           "ORDER BY UserID, SearchPhrase LIMIT 10",
    "q18": "SELECT UserID, CAST(extract(minute FROM {TS}) AS INT) AS m, "
           "SearchPhrase, COUNT(*) AS c FROM {H} "
           "GROUP BY UserID, m, SearchPhrase "
           "ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10",
    "q19": "SELECT UserID FROM {H} WHERE UserID = 435090932899640449",
    "q20": "SELECT COUNT(*) AS c FROM {H} WHERE URL LIKE '%google%'",
    "q21": "SELECT SearchPhrase, MIN(URL) AS mu, COUNT(*) AS c FROM {H} "
           "WHERE URL LIKE '%google%' AND SearchPhrase <> '' "
           "GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10",
    "q22": "SELECT SearchPhrase, MIN(URL) AS mu, MIN(Title) AS mt, "
           "COUNT(*) AS c, COUNT(DISTINCT UserID) AS u FROM {H} "
           "WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%' "
           "AND SearchPhrase <> '' GROUP BY SearchPhrase "
           "ORDER BY c DESC, SearchPhrase LIMIT 10",
    "q23": "SELECT {ALLCOLS} FROM {H} WHERE URL LIKE '%google%' "
           "ORDER BY EventTime, WatchID LIMIT 10",
    "q24": "SELECT SearchPhrase FROM {H} WHERE SearchPhrase <> '' "
           "ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10",
    "q25": "SELECT SearchPhrase FROM {H} WHERE SearchPhrase <> '' "
           "ORDER BY SearchPhrase LIMIT 10",
    "q26": "SELECT SearchPhrase FROM {H} WHERE SearchPhrase <> '' "
           "ORDER BY EventTime, SearchPhrase, WatchID LIMIT 10",
    "q27": "SELECT CounterID, AVG({OCTLEN}(URL)) AS l, COUNT(*) AS c "
           "FROM {H} WHERE URL <> '' GROUP BY CounterID "
           "HAVING COUNT(*) > 100000 ORDER BY l DESC, CounterID LIMIT 25",
    "q28": "SELECT REGEXP_REPLACE(Referer, "
           "'^https?://(?:www{DOT})?([^/]+)/.*$', '{R1}') AS k, "
           "AVG({OCTLEN}(Referer)) AS l, COUNT(*) AS c, "
           "MIN(Referer) AS mr FROM {H} WHERE Referer <> '' GROUP BY k "
           "HAVING COUNT(*) > 100000 ORDER BY l DESC, k LIMIT 25",
    "q29": f"SELECT {_Q29_SUMS} FROM {{H}}",
    "q30": "SELECT SearchEngineID, ClientIP, COUNT(*) AS c, "
           "CAST(SUM(IsRefresh) AS BIGINT) AS s, "
           "AVG(ResolutionWidth) AS a FROM {H} WHERE SearchPhrase <> '' "
           "GROUP BY SearchEngineID, ClientIP "
           "ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10",
    "q31": "SELECT WatchID, ClientIP, COUNT(*) AS c, "
           "CAST(SUM(IsRefresh) AS BIGINT) AS s, "
           "AVG(ResolutionWidth) AS a FROM {H} WHERE SearchPhrase <> '' "
           "GROUP BY WatchID, ClientIP "
           "ORDER BY c DESC, WatchID, ClientIP LIMIT 10",
    "q32": "SELECT WatchID, ClientIP, COUNT(*) AS c, "
           "CAST(SUM(IsRefresh) AS BIGINT) AS s, "
           "AVG(ResolutionWidth) AS a FROM {H} "
           "GROUP BY WatchID, ClientIP "
           "ORDER BY c DESC, WatchID, ClientIP LIMIT 10",
    "q33": "SELECT URL, COUNT(*) AS c FROM {H} GROUP BY URL "
           "ORDER BY c DESC, URL LIMIT 10",
    "q34": "SELECT 1 AS one, URL, COUNT(*) AS c FROM {H} GROUP BY 1, URL "
           "ORDER BY c DESC, URL LIMIT 10",
    "q35": "SELECT ClientIP, ClientIP - 1 AS ip1, ClientIP - 2 AS ip2, "
           "ClientIP - 3 AS ip3, COUNT(*) AS c FROM {H} "
           "GROUP BY ClientIP, ip1, ip2, ip3 "
           "ORDER BY c DESC, ClientIP LIMIT 10",
    "q36": "SELECT URL, COUNT(*) AS PageViews FROM {H} "
           "WHERE CounterID = 62 AND EventDate >= '2013-07-01' "
           "AND EventDate <= '2013-07-31' AND DontCountHits = 0 "
           "AND IsRefresh = 0 AND URL <> '' GROUP BY URL "
           "ORDER BY PageViews DESC, URL LIMIT 10",
    "q37": "SELECT Title, COUNT(*) AS PageViews FROM {H} "
           "WHERE CounterID = 62 AND EventDate >= '2013-07-01' "
           "AND EventDate <= '2013-07-31' AND DontCountHits = 0 "
           "AND IsRefresh = 0 AND Title <> '' GROUP BY Title "
           "ORDER BY PageViews DESC, Title LIMIT 10",
    "q38": "SELECT URL, COUNT(*) AS PageViews FROM {H} "
           "WHERE CounterID = 62 AND EventDate >= '2013-07-01' "
           "AND EventDate <= '2013-07-31' AND IsRefresh = 0 "
           "AND IsLink <> 0 AND IsDownload = 0 GROUP BY URL "
           "ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 1000",
    "q39": "SELECT TraficSourceID, SearchEngineID, AdvEngineID, "
           "CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) "
           "THEN Referer ELSE '' END AS Src, URL AS Dst, "
           "COUNT(*) AS PageViews FROM {H} WHERE CounterID = 62 "
           "AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' "
           "AND IsRefresh = 0 "
           "GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst "
           "ORDER BY PageViews DESC, TraficSourceID, SearchEngineID, "
           "AdvEngineID, Src, Dst LIMIT 10 OFFSET 1000",
    "q40": "SELECT URLHash, CAST(EventDate AS TIMESTAMP) AS EventDay, "
           "COUNT(*) AS PageViews FROM {H} "
           "WHERE CounterID = 62 AND EventDate >= '2013-07-01' "
           "AND EventDate <= '2013-07-31' AND IsRefresh = 0 "
           "AND TraficSourceID IN (-1, 6) "
           "AND RefererHash = 3594120000172545465 "
           "GROUP BY URLHash, EventDate "
           "ORDER BY PageViews DESC, URLHash, EventDate "
           "LIMIT 10 OFFSET 100",
    "q41": "SELECT WindowClientWidth, WindowClientHeight, "
           "COUNT(*) AS PageViews FROM {H} WHERE CounterID = 62 "
           "AND EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' "
           "AND IsRefresh = 0 AND DontCountHits = 0 "
           "AND URLHash = 2868770270353813622 "
           "GROUP BY WindowClientWidth, WindowClientHeight "
           "ORDER BY PageViews DESC, WindowClientWidth, WindowClientHeight "
           "LIMIT 10 OFFSET 10000",
    "q42": "SELECT CAST(DATE_TRUNC('minute', {TS}) AS TIMESTAMP) AS M, "
           "COUNT(*) AS PageViews FROM {H} WHERE CounterID = 62 "
           "AND EventDate >= '2013-07-14' AND EventDate <= '2013-07-15' "
           "AND IsRefresh = 0 AND DontCountHits = 0 "
           "GROUP BY M ORDER BY M LIMIT 10 OFFSET 1000",
}


def _spark_sql(q: str) -> str:
    # Spark SQL string literals process backslash escapes: '\\.' -> \.
    return _CB43[q].format(
        H="hits_cb43",
        TS="timestamp_seconds(EventTime)",
        R1="$1",
        DOT="\\\\.",
        OCTLEN="octet_length",
        ALLCOLS=_ALLCOLS,
    )


def _duck_sql(q: str) -> str:
    # DuckDB string literals are verbatim: '\.' is already the regex \.
    return _CB43[q].format(
        H=f"read_parquet('{_FIXTURE}')",
        TS="to_timestamp(EventTime)",
        R1="\\1",
        DOT="\\.",
        OCTLEN="strlen",  # DuckDB's byte-length of VARCHAR
        ALLCOLS=_ALLCOLS,
    )


def _make_builder(q: str):
    def builder(spark, sf_dir):
        ensure_hits_fixture()
        spark.read.parquet(_FIXTURE).createOrReplaceTempView("hits_cb43")
        return spark.sql(_spark_sql(q))

    builder.__name__ = f"cb43_{q}"
    builder.__doc__ = (
        f"ClickBench canonical {q} (bench/clickbench/single/{q}.bench) over "
        "the deterministic hits-shaped fixture; DuckDB runs the same text "
        "over the same parquet."
    )
    return builder


for _q in sorted(_CB43):
    register_query(f"cb43_{_q}", oracle=_duck_sql(_q))(_make_builder(_q))
