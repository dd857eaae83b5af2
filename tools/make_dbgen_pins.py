"""Build dbgen text-pool pins from the reference's checked-in SF0.01 CSVs.

A pin is (pool_offset, true_text, table, row, length_draw): the comment
column values in /root/reference/testdata/csv/tpch_small/*.csv are
substrings of the true 300 MB dbgen text pool, and the per-column
Lehmer streams (already bit-proven for every numeric column) tell us
the offset/length draw values for each row. Output feeds the dists
solver (tools/solve_dbgen_text.py / locate_dbgen_sentences.py) and the
exactness test.

Run: python tools/make_dbgen_pins.py [out.pkl]
"""

import csv
import pickle
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from glaredb_spark.sources.dbgen import Stream  # noqa: E402
from glaredb_spark.sources.dbgen_text import POOL_SIZE  # noqa: E402

REF = "/root/reference/testdata/csv/tpch_small"
SF = 0.01

# table -> (stream name, avg len, comments per stream row, csv column)
TABLES = {
    "part": ("P_CMNT", 14, 1, "p_comment", 2000),
    "supplier": ("S_CMNT", 63, 1, "s_comment", 100),
    "customer": ("C_CMNT", 73, 1, "c_comment", 1500),
    "orders": ("O_CMNT", 49, 1, "o_comment", 15000),
    "partsupp": ("PS_CMNT", 124, 4, "ps_comment", 2000),
    "region": ("R_CMNT", 72, 1, "r_comment", 5),
    "nation": ("N_CMNT", 72, 1, "n_comment", 25),
}


def load_column(table: str, col: str) -> list[str]:
    with open(f"{REF}/{table}.csv", newline="") as fh:
        rd = csv.DictReader(fh)
        return [row[col] for row in rd]


def pins_for(table: str):
    stream_name, avg, per_row, col, n = TABLES[table]
    vals = load_column(table, col)
    assert len(vals) == n * per_row or table in ("region", "nation"), (
        table, len(vals))
    lo, hi = int(avg * 0.4), int(avg * 1.6)
    st = Stream(stream_name, 0, len(vals) // per_row)
    out = []
    for i in range(per_row):
        off = st.draw(0, POOL_SIZE - hi)
        ln = st.draw(lo, hi)
        for r in range(len(off)):
            text = vals[r * per_row + i]
            out.append((int(off[r]), text, table, r * per_row + i,
                        int(ln[r])))
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dbgen_pins_tagged.pkl"
    allp = []
    for t in TABLES:
        ps = pins_for(t)
        # sanity: drawn length must equal actual text length
        n_ok = sum(1 for p in ps if len(p[1]) == p[4])
        print(f"{t}: {len(ps)} pins, length-draw matches {n_ok}/{len(ps)}")
        allp.extend(ps)
    pickle.dump(allp, open(out_path, "wb"))
    print(f"wrote {len(allp)} pins -> {out_path}")


if __name__ == "__main__":
    main()
