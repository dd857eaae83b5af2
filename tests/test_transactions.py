"""SQL multi-table transaction surface: BEGIN / INSERT / COMMIT /
ROLLBACK batching onto the Iceberg REST catalog's atomic
commitTransaction (r14, VERDICT r13 next #1).

Reference anchor: the commitTransaction route is part of the same
OpenAPI surface the reference's catalog stub targets
(crates/glaredb_ext_iceberg/src/catalog/rest.rs:22, client.rs:257).
"""

import pytest

from glaredb_spark.session import GlareSession, TransactionError
from glaredb_spark.sources import iceberg_rest as rest
from glaredb_spark.sources.iceberg_rest import IcebergRestError
from glaredb_spark.sources.iceberg_rest_emulator import IcebergRestEmulator
from glaredb_spark.sources.iceberg_native import (
    _metadata_path,
    write_iceberg_native,
)


@pytest.fixture()
def sess(spark, tmp_path):
    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    emu.add_namespace("core")
    for name, rows in (("facts", 4), ("sums", 2)):
        loc = str(tmp_path / "wh" / "core" / name)
        write_iceberg_native(
            spark.range(rows).selectExpr("id", "id * 2 AS v"), loc
        )
        emu.register("core", name, _metadata_path(loc))
    s = GlareSession(spark)
    s.sql(f"ATTACH ICEBERG_REST DATABASE AS lake (endpoint '{endpoint}')")
    yield s, emu, endpoint
    rest.detach_iceberg_rest(spark, "lake")
    emu.stop()
    rest._PREFIX_CACHE.clear()


def _counts(spark, endpoint):
    return (
        rest.read_table(spark, endpoint, "core", "facts").count(),
        rest.read_table(spark, endpoint, "core", "sums").count(),
    )


def test_commit_publishes_both_tables(spark, sess):
    s, emu, endpoint = sess
    assert s.sql("BEGIN").collect()[0].status == "began transaction"
    st = s.sql(
        "INSERT INTO lake.core.facts SELECT id, id*2 AS v FROM range(10, 13)"
    ).collect()[0].status
    assert "buffered insert into core.facts" in st
    s.sql("INSERT INTO lake.core.sums VALUES (100, 200), (101, 202)")
    # nothing is visible before COMMIT — readers never see a half state
    assert _counts(spark, endpoint) == (4, 2)
    got = {r.table: r.Count for r in s.sql("COMMIT").collect()}
    assert got == {"core.facts": 3, "core.sums": 2}
    assert _counts(spark, endpoint) == (7, 4)


def test_rollback_discards_buffer(spark, sess):
    s, emu, endpoint = sess
    s.sql("BEGIN TRANSACTION")
    s.sql("INSERT INTO lake.core.facts VALUES (99, 198)")
    st = s.sql("ROLLBACK").collect()[0].status
    assert "rolled back 1" in st
    assert _counts(spark, endpoint) == (4, 2)
    # the session is reusable: a fresh transaction commits cleanly
    s.sql("BEGIN")
    s.sql("INSERT INTO lake.core.facts VALUES (99, 198)")
    s.sql("COMMIT")
    assert _counts(spark, endpoint) == (5, 2)


def test_conflict_on_second_table_leaves_first_unadvanced(
    spark, sess, monkeypatch
):
    """The all-or-nothing contract: a commitTransaction that can never
    land (injected permanent 409) leaves EVERY table unadvanced —
    table A shows no snapshot from the failed transaction."""
    s, emu, endpoint = sess
    base_a = len(rest.load_table(endpoint, "core", "facts")
                 ["metadata"]["snapshots"])
    real = rest._request

    def always_conflict(url, token=None, method="GET", payload=None):
        if method == "POST" and url.endswith("/transactions/commit"):
            raise rest.CommitConflict("injected: table B is stale", code=409)
        return real(url, token, method, payload)

    monkeypatch.setattr(rest, "_request", always_conflict)
    s.sql("BEGIN")
    s.sql("INSERT INTO lake.core.facts VALUES (50, 100)")
    s.sql("INSERT INTO lake.core.sums VALUES (60, 120)")
    with pytest.raises(IcebergRestError, match="lost the commit race"):
        s.sql("COMMIT")
    monkeypatch.undo()
    assert _counts(spark, endpoint) == (4, 2)
    meta_a = rest.load_table(endpoint, "core", "facts")["metadata"]
    assert len(meta_a["snapshots"]) == base_a
    # the failed COMMIT ended the transaction (standard SQL abort)
    with pytest.raises(TransactionError, match="without an open"):
        s.sql("COMMIT")


def test_same_table_twice_unions_into_one_entry(spark, sess):
    s, emu, endpoint = sess
    s.sql("BEGIN")
    s.sql("INSERT INTO lake.core.facts VALUES (70, 140)")
    s.sql("INSERT INTO lake.core.facts VALUES (71, 142), (72, 144)")
    got = {r.table: r.Count for r in s.sql("COMMIT").collect()}
    assert got == {"core.facts": 3}
    assert _counts(spark, endpoint) == (7, 2)
    # ONE snapshot for the whole transaction's worth on that table
    meta = rest.load_table(endpoint, "core", "facts")["metadata"]
    assert len(meta["snapshots"]) == 2  # initial + txn


def test_named_errors(spark, sess, tmp_path):
    s, emu, endpoint = sess
    with pytest.raises(TransactionError, match="COMMIT without an open"):
        s.sql("COMMIT")
    with pytest.raises(TransactionError, match="ROLLBACK without an open"):
        s.sql("ROLLBACK")
    s.sql("BEGIN")
    with pytest.raises(TransactionError, match="already open"):
        s.sql("BEGIN")
    with pytest.raises(TransactionError, match="got 'SELECT'"):
        s.sql("SELECT 1")
    with pytest.raises(TransactionError, match="not one"):
        s.sql("INSERT INTO local_table VALUES (1)")
    s.sql("ROLLBACK")
    # cross-catalog transactions are refused with a named error
    emu2 = IcebergRestEmulator(str(tmp_path / "wh2"), prefix="w2")
    ep2 = emu2.start()
    emu2.add_namespace("other")
    loc = str(tmp_path / "wh2" / "other" / "t")
    write_iceberg_native(spark.range(2).selectExpr("id", "id*2 AS v"), loc)
    emu2.register("other", "t", _metadata_path(loc))
    s.sql(f"ATTACH ICEBERG_REST DATABASE AS lake2 (endpoint '{ep2}')")
    try:
        s.sql("BEGIN")
        s.sql("INSERT INTO lake.core.facts VALUES (1, 2)")
        s.sql("INSERT INTO lake2.other.t VALUES (1, 2)")
        with pytest.raises(TransactionError, match="ONE attached catalog"):
            s.sql("COMMIT")
    finally:
        rest.detach_iceberg_rest(spark, "lake2")
        emu2.stop()


def test_sources_bind_at_buffer_execute_at_commit(spark, sess):
    """Buffered INSERT sources are lazy plans ANALYZED at buffer time:
    redefining a source view after buffering does not change what
    commits (statement-time binding), while execution — the staged
    write — happens only at COMMIT."""
    s, emu, endpoint = sess
    spark.range(3).selectExpr("id", "id * 7 AS v").createOrReplaceTempView(
        "txn_src"
    )
    s.sql("BEGIN")
    s.sql("INSERT INTO lake.core.facts SELECT * FROM txn_src")
    # no snapshot exists yet — nothing executed at buffer time
    assert len(rest.load_table(endpoint, "core", "facts")
               ["metadata"]["snapshots"]) == 1
    # redefine AFTER buffering: the buffered plan keeps its binding
    spark.range(5).selectExpr("id", "id * 7 AS v").createOrReplaceTempView(
        "txn_src"
    )
    got = {r.table: r.Count for r in s.sql("COMMIT").collect()}
    assert got == {"core.facts": 3}


def test_mixed_dml_transaction(spark, sess):
    """INSERT + DELETE + UPDATE in ONE transaction (r14 mixed-DML
    generalization): statements chain in order — the DELETE sees the
    transaction's own insert — and everything publishes in one atomic
    commitTransaction."""
    s, emu, endpoint = sess
    s.sql("BEGIN")
    s.sql("INSERT INTO lake.core.facts VALUES (100, 1), (101, 2)")
    # chained: deletes one PRE-existing row AND one row inserted above
    s.sql("DELETE FROM lake.core.facts WHERE id = 0 OR id = 100")
    s.sql("UPDATE lake.core.sums SET v = v * 10 WHERE id = 1")
    # nothing visible before COMMIT
    assert _counts(spark, endpoint) == (4, 2)
    rows = {(r.op, r.table): r.Count for r in s.sql("COMMIT").collect()}
    assert rows == {
        ("insert", "core.facts"): 2,
        ("delete", "core.facts"): 2,
        ("update", "core.sums"): 1,
    }
    facts = rest.read_table(spark, endpoint, "core", "facts")
    assert sorted(r.id for r in facts.collect()) == [1, 2, 3, 101]
    sums = {r.id: r.v
            for r in rest.read_table(spark, endpoint, "core", "sums")
            .collect()}
    assert sums == {0: 0, 1: 20}


def test_mixed_transaction_conflict_all_or_nothing(
    spark, sess, monkeypatch
):
    """A permanently-conflicting mixed transaction leaves EVERY table
    unadvanced — including the DELETE's COW rewrite."""
    s, emu, endpoint = sess
    base_snaps = {
        t: len(rest.load_table(endpoint, "core", t)
               ["metadata"]["snapshots"])
        for t in ("facts", "sums")
    }
    real = rest._request

    def always_conflict(url, token=None, method="GET", payload=None):
        if method == "POST" and url.endswith("/transactions/commit"):
            raise rest.CommitConflict("injected", code=409)
        return real(url, token, method, payload)

    monkeypatch.setattr(rest, "_request", always_conflict)
    s.sql("BEGIN")
    s.sql("DELETE FROM lake.core.facts WHERE id < 2")
    s.sql("INSERT INTO lake.core.sums VALUES (50, 100)")
    with pytest.raises(IcebergRestError, match="lost the commit race"):
        s.sql("COMMIT")
    monkeypatch.undo()
    assert _counts(spark, endpoint) == (4, 2)
    for t, n in base_snaps.items():
        assert len(rest.load_table(endpoint, "core", t)
                   ["metadata"]["snapshots"]) == n


def test_transaction_noop_delete_contributes_nothing(spark, sess):
    s, emu, endpoint = sess
    s.sql("BEGIN")
    s.sql("DELETE FROM lake.core.facts WHERE id > 9000")  # matches 0
    s.sql("INSERT INTO lake.core.sums VALUES (60, 120)")
    rows = {(r.op, r.table): r.Count for r in s.sql("COMMIT").collect()}
    assert rows == {
        ("delete", "core.facts"): 0,
        ("insert", "core.sums"): 1,
    }
    # facts got NO new snapshot from the no-op delete
    meta = rest.load_table(endpoint, "core", "facts")["metadata"]
    assert len(meta["snapshots"]) == 1
    assert _counts(spark, endpoint) == (4, 3)


def test_property_txn_chain_matches_shadow(spark, tmp_path):
    """Property check: random mixed-DML transactions applied through
    BEGIN...COMMIT equal the same ops applied in order to a shadow
    model — the chained-planning semantics (each op sees its
    predecessors' uncommitted state) hold for arbitrary compositions,
    and per-op Counts match the shadow's."""
    import random

    from glaredb_spark.sources.iceberg_native import (
        _metadata_path,
        write_iceberg_native,
    )

    rng = random.Random(20814)
    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    emu.add_namespace("pp")
    s = GlareSession(spark)
    s.sql(f"ATTACH ICEBERG_REST DATABASE AS plk (endpoint '{endpoint}')")
    try:
        for trial in range(4):
            name = f"t{trial}"
            shadow = {i: i * 2 for i in range(8)}
            loc = str(tmp_path / "wh" / "pp" / name)
            write_iceberg_native(
                spark.createDataFrame(
                    sorted(shadow.items()), "id long, v long"
                ),
                loc,
            )
            emu.register("pp", name, _metadata_path(loc))
            next_id = 100
            expected_counts = []
            s.sql("BEGIN")
            for _ in range(rng.randrange(2, 6)):
                kind = rng.choice(("insert", "delete", "update"))
                if kind == "insert":
                    n = rng.randrange(1, 4)
                    vals = ", ".join(
                        f"({next_id + j}, {(next_id + j) * 2})"
                        for j in range(n)
                    )
                    s.sql(f"INSERT INTO plk.pp.{name} VALUES {vals}")
                    for j in range(n):
                        shadow[next_id + j] = (next_id + j) * 2
                    next_id += n
                    expected_counts.append(("insert", n))
                elif kind == "delete":
                    k, j = rng.randrange(2, 5), rng.randrange(0, 2)
                    s.sql(
                        f"DELETE FROM plk.pp.{name} "
                        f"WHERE id % {k} = {j}"
                    )
                    hit = [i for i in shadow if i % k == j]
                    for i in hit:
                        del shadow[i]
                    expected_counts.append(("delete", len(hit)))
                else:
                    c = rng.randrange(1, 9)
                    lim = rng.randrange(2, 200)
                    s.sql(
                        f"UPDATE plk.pp.{name} SET v = v + {c} "
                        f"WHERE id < {lim}"
                    )
                    hit = [i for i in shadow if i < lim]
                    for i in hit:
                        shadow[i] += c
                    expected_counts.append(("update", len(hit)))
            got = [(r.op, r.Count) for r in s.sql("COMMIT").collect()]
            # adjacent same-table inserts coalesce into one reported
            # row — coalesce the expectation the same way
            want = []
            for op, n in expected_counts:
                if op == "insert" and want and want[-1][0] == "insert":
                    want[-1] = ("insert", want[-1][1] + n)
                else:
                    want.append((op, n))
            assert got == want, f"trial {trial}: {got} != {want}"
            final = {
                r.id: r.v
                for r in rest.read_table(
                    spark, endpoint, "pp", name
                ).collect()
            }
            assert final == shadow, f"trial {trial}"
    finally:
        rest.detach_iceberg_rest(spark, "plk")
        emu.stop()
        rest._PREFIX_CACHE.clear()


def test_merge_buffers_in_transaction(spark, sess):
    """MERGE INTO inside BEGIN ... COMMIT (r15, VERDICT r14 #3): the
    merge parses at buffer time, plans at COMMIT against the chain's
    base — so it sees the transaction's own staged INSERT — and the
    whole mix publishes as ONE commitTransaction."""
    s, emu, endpoint = sess
    s.sql("BEGIN")
    s.sql("INSERT INTO lake.core.facts VALUES (100, 1)")
    # the merge must see id=100 from the buffered insert above as a
    # MATCH (update), id=1 as a pre-existing match, id=200 as an insert
    st = s.sql(
        "MERGE INTO lake.core.facts t USING "
        "(SELECT 100 AS id, CAST(7 AS bigint) AS v UNION ALL "
        " SELECT 1, 8 UNION ALL SELECT 200, 9) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0].status
    assert "buffered merge into core.facts" in st
    s.sql("DELETE FROM lake.core.facts WHERE id = 0")
    assert _counts(spark, endpoint) == (4, 2)
    rows = {(r.op, r.table): r.Count for r in s.sql("COMMIT").collect()}
    assert rows == {
        ("insert", "core.facts"): 1,
        ("merge", "core.facts"): 3,   # 2 updated + 1 inserted
        ("delete", "core.facts"): 1,
    }
    facts = {
        r.id: r.v
        for r in rest.read_table(spark, endpoint, "core", "facts")
        .collect()
    }
    assert facts == {1: 8, 2: 4, 3: 6, 100: 7, 200: 9}


def test_merge_transaction_conflict_all_or_nothing(
    spark, sess, monkeypatch
):
    """The injected-conflict contract extended to the merge arm: a
    permanently-409 commitTransaction containing a MERGE leaves every
    table unadvanced."""
    s, emu, endpoint = sess
    base_snaps = len(
        rest.load_table(endpoint, "core", "facts")["metadata"]["snapshots"]
    )
    real = rest._request

    def always_conflict(url, token=None, method="GET", payload=None):
        if method == "POST" and url.endswith("/transactions/commit"):
            raise rest.CommitConflict("injected", code=409)
        return real(url, token, method, payload)

    monkeypatch.setattr(rest, "_request", always_conflict)
    s.sql("BEGIN")
    s.sql(
        "MERGE INTO lake.core.facts t USING "
        "(SELECT 0 AS id, CAST(-1 AS bigint) AS v) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    s.sql("INSERT INTO lake.core.sums VALUES (50, 100)")
    with pytest.raises(IcebergRestError, match="lost the commit race"):
        s.sql("COMMIT")
    monkeypatch.undo()
    assert _counts(spark, endpoint) == (4, 2)
    assert len(
        rest.load_table(endpoint, "core", "facts")["metadata"]["snapshots"]
    ) == base_snaps
    assert rest.read_table(
        spark, endpoint, "core", "facts"
    ).filter("v = -1").count() == 0


def test_for_branch_refused_in_transaction(spark, sess):
    s, emu, endpoint = sess
    s.sql("BEGIN")
    with pytest.raises(TransactionError, match="FOR BRANCH"):
        s.sql("DELETE FROM lake.core.facts FOR BRANCH dev WHERE id = 0")
    s.sql("ROLLBACK")
