"""Bit-exact TPC-H dbgen — pure-numpy row engine, Spark-distributable.

The reference registers dbgen as table functions via the public
``tpchgen`` crate (crates/glaredb_ext_tpch_gen/src/lib.rs, Cargo.toml
``tpchgen = "1.1.1"``), a Rust port of the TPC-H spec's generator that
is value-identical to C dbgen. This module is an independent Python
implementation of the same public algorithm (TPC-H specification
§4.2.2-4.2.3 + the well-known dbgen RNG design, as also re-implemented
by airlift/tpch and tpchgen-rs):

- one Lehmer LCG per column stream: ``seed' = seed * 16807 mod 2^31-1``
  with a fixed per-row seed usage, so any row range can be generated
  independently by leap-frogging the seed (``seed * 16807^(usage*row)``)
  — the same property dbgen's parallel mode uses, and exactly what a
  Spark ``mapInPandas`` over row ranges needs;
- ``UnifInt(low, high)``: ``low + floor(seed/2147483647.0 * (high-low+1))``
  (double math, matching C's rounding);
- weighted string distributions picked by cumulative weight;
- V_STR alphanumerics: one draw per 5 characters, 6 bits per char;
- text columns: substrings of the grammar text pool
  (built in dbgen_pool.py / dbgen_text.py, cached on disk).

Bit-exactness is proven in tests/test_dbgen_exact.py against the
reference's checked-in dbgen SF0.01 output
(testdata/csv/tpch_small/*.csv) — every cell of every table, text
columns included — and cross-checked against an independent dbgen
implementation (DuckDB's tpch extension) at SF 0.1.

Everything here is vectorized numpy — no Python-level per-row work —
so a 600k-row SF0.1 table builds in well under a second per partition.
"""

from __future__ import annotations

import numpy as np

M = 2147483647  # 2^31 - 1 (Lehmer modulus)
G = 16807  # multiplier

# --- per-column stream seeds (dbgen's rnd.c seed table; public) -------------
SEEDS = {
    "P_MFG": (1, 1),
    "P_BRND": (46831694, 1),
    "P_TYPE": (1841581359, 1),
    "P_SIZE": (1193163244, 1),
    "P_CNTR": (727633698, 1),
    "TEXT_POOL": (933588178, 0),
    "P_CMNT": (804159733, 2),
    "PS_QTY": (1671059989, 4),
    "PS_SCST": (1051288424, 4),
    "PS_CMNT": (1961692154, 8),
    "O_SUPP": (1227283347, 1),
    "O_CLRK": (1171034773, 1),
    "O_CMNT": (276090261, 2),
    "O_ODATE": (1066728069, 1),
    # line streams in dbgen's rnd.c order: qty, dcnt, tax, instruct,
    # shipmode, partkey, suppkey, shipdate, commitdate, receiptdate,
    # returnflag, comment — each assignment verified against dbgen's
    # canonical order-1 lines + the tpch_small oracle (the partkey seed
    # was additionally recovered by constraint-solving the 6 canonical
    # partkeys down to a unique 31-bit seed)
    "L_QTY": (209208115, 7),
    "L_DCNT": (554590007, 7),
    "L_TAX": (721958466, 7),
    "L_SHIP": (1371272478, 7),
    "L_SMODE": (675466456, 7),
    "L_PKEY": (1808217256, 7),
    "L_SKEY": (2095021727, 7),
    "L_SDTE": (1769349045, 7),
    "L_CDTE": (904914315, 7),
    "L_RDTE": (373135028, 7),
    "L_RFLG": (717419739, 7),
    "L_CMNT": (1095462486, 14),
    "C_ADDR": (881155353, 9),
    "C_NTRG": (1489529863, 1),
    "C_PHNE": (1521138112, 3),
    "C_ABAL": (298370230, 1),
    "C_MSEG": (1140279430, 1),
    "C_CMNT": (1335826707, 2),
    "S_ADDR": (706178559, 9),
    "S_NTRG": (110356601, 1),
    "S_PHNE": (884434366, 3),
    "S_ABAL": (962338209, 1),
    "S_CMNT": (1341315363, 2),
    "P_NAME": (709314158, 92),
    "O_PRIO": (591449447, 1),
    "HVAR": (431918286, 1),
    "O_CKEY": (851767375, 1),
    "N_CMNT": (606179079, 2),
    "R_CMNT": (1500869201, 2),
    "O_LCNT": (1434868289, 1),
    "BBB_JNK": (263032577, 1),
    "BBB_TYPE": (753643799, 1),
    "BBB_CMNT": (202794285, 1),
    "BBB_OFFSET": (715851524, 1),
}

# --- table cardinality bases (rows at SF 1) ---------------------------------
BASE = {
    "part": 200_000,
    "supplier": 10_000,
    "partsupp": 800_000,  # part * 4
    "customer": 150_000,
    "orders": 1_500_000,
    "lineitem": None,  # derived
    "nation": 25,
    "region": 5,
}

STARTDATE = np.datetime64("1992-01-01")
CURRENTDATE_OFF = 1263  # 1995-06-17 - 1992-01-01 in days
ODATE_SPAN = 2406  # orderdate in STARTDATE + [0, 2405]


def _pk(pool_size: int | None) -> dict:
    """kwargs for the text helpers: explicit pool size or their default
    (POOL_SIZE_FULL — the reference's tpchgen-crate lineage)."""
    return {} if pool_size is None else {"pool_size": pool_size}


def _rows(table: str, sf: float) -> int:
    return int(round(BASE[table] * sf)) if BASE[table] else 0


def pow_mod_vec(exp: np.ndarray) -> np.ndarray:
    """16807^exp mod M for a uint64 exponent array (square-and-multiply,
    fully vectorized: ~40 vector ops regardless of row count)."""
    result = np.ones(exp.shape, dtype=np.uint64)
    base = np.uint64(G)
    e = exp.astype(np.uint64).copy()
    m = np.uint64(M)
    while e.any():
        odd = (e & np.uint64(1)).astype(bool)
        result[odd] = (result[odd] * base) % m
        e >>= np.uint64(1)
        base = (base * base) % m
    return result


def advance(seed: int, count: int) -> int:
    return (seed * pow(G, count, M)) % M


class Stream:
    """One dbgen column stream over a row range [start, start+n).

    ``seeds`` holds each row's current seed; ``draw`` advances every
    row's seed one step and returns the UnifInt values — columns make a
    fixed number of draws per row (unused draws simply aren't taken;
    the NEXT row's position comes from the leapfrog, not from
    finishing this row's usage)."""

    def __init__(self, name: str, start_row: int, n: int,
                 seeds_override: dict | None = None):
        seed, usage = (seeds_override or SEEDS)[name]
        self.usage = usage
        idx = (np.uint64(start_row) + np.arange(n, dtype=np.uint64)) \
            * np.uint64(usage)
        self.seeds = (np.uint64(seed % M) * pow_mod_vec(idx)) % np.uint64(M)

    def draw(self, low: int, high: int) -> np.ndarray:
        self.seeds = (self.seeds * np.uint64(G)) % np.uint64(M)
        spread = float(high - low + 1)
        vals = (self.seeds.astype(np.float64) / float(M)) * spread
        return low + vals.astype(np.int64)

    def draw_raw(self) -> np.ndarray:
        """UnifInt(0, 2^31-1) — the V_STR 5-chars-per-draw source."""
        return self.draw(0, M)


# --- distributions (uniform lists; order recovered against dbgen output) ----

# The 150 p_types: syllable1 x syllable2 x syllable3 in dists.dss order.
TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
P_TYPES = [f"{a} {b} {c}" for a in TYPE_S1 for b in TYPE_S2 for c in TYPE_S3]

CNTR_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CNTR_S2 = ["CASE", "BOX", "BAG", "JAR", "PACK", "PKG", "CAN", "DRUM"]
P_CNTRS = [f"{a} {b}" for a in CNTR_S1 for b in CNTR_S2]

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
INSTRUCTIONS = ["DELIVER IN PERSON", "COLLECT COD", "TAKE BACK RETURN", "NONE"]
SHIP_MODES = ["REG AIR", "AIR", "RAIL", "TRUCK", "MAIL", "FOB", "SHIP"]
RETURN_FLAGS = ["R", "A"]

COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished",
    "chartreuse", "chiffon", "chocolate", "coral", "cornflower", "cornsilk",
    "cream", "cyan", "dark", "deep", "dim", "dodger", "drab", "firebrick",
    "floral", "forest", "frosted", "gainsboro", "ghost", "goldenrod",
    "green", "grey", "honeydew", "hot", "indian", "ivory", "khaki", "lace",
    "lavender", "lawn", "lemon", "light", "lime", "linen", "magenta",
    "maroon", "medium", "metallic", "midnight", "mint", "misty", "moccasin",
    "navajo", "navy", "olive", "orange", "orchid", "pale", "papaya",
    "peach", "peru", "pink", "plum", "powder", "puff", "purple", "red",
    "rose", "rosy", "royal", "saddle", "salmon", "sandy", "seashell",
    "sienna", "sky", "slate", "smoke", "snow", "spring", "steel", "tan",
    "thistle", "tomato", "turquoise", "violet", "wheat", "white", "yellow",
]

ALPHANUM = (
    "0123456789abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ,"
)
_ALPHANUM_ARR = np.frombuffer(ALPHANUM.encode(), dtype=np.uint8)


def pick(stream: Stream, values: list[str]) -> np.ndarray:
    """Uniform weighted pick (all dists here are weight-1 per entry):
    the UnifInt value IS the index."""
    idx = stream.draw(0, len(values) - 1)
    return np.array(values, dtype=object)[idx]


def v_str(stream: Stream, avg_len: int) -> np.ndarray:
    """dbgen V_STR: length = UnifInt(.4*avg, 1.6*avg), then one raw draw
    per 5 chars, 6 bits per char from the 64-char alphabet. Vectorized:
    take the max number of draws for every row, mask by length."""
    low, high = int(avg_len * 0.4), int(avg_len * 1.6)
    lengths = stream.draw(low, high)
    max_draws = (high + 4) // 5
    draws = np.empty((len(lengths), max_draws), dtype=np.uint64)
    for d in range(max_draws):
        draws[:, d] = stream.draw_raw()
    # char i of row r: (draws[r, i//5] >> ((i%5)*6)) & 63
    chars = np.zeros((len(lengths), high), dtype=np.uint8)
    for i in range(high):
        j = (draws[:, i // 5] >> np.uint64((i % 5) * 6)) & np.uint64(63)
        chars[:, i] = _ALPHANUM_ARR[j.astype(np.int64)]
    out = np.empty(len(lengths), dtype=object)
    for r in range(len(lengths)):
        out[r] = chars[r, : lengths[r]].tobytes().decode()
    return out


def phone(stream: Stream, nation_keys: np.ndarray) -> np.ndarray:
    a = stream.draw(100, 999)
    b = stream.draw(100, 999)
    c = stream.draw(1000, 9999)
    cc = nation_keys + 10
    return np.array(
        [f"{w}-{x}-{y}-{z}" for w, x, y, z in zip(cc, a, b, c)],
        dtype=object,
    )


def retail_price_cents(partkey: np.ndarray) -> np.ndarray:
    p = partkey.astype(np.int64)
    return 90000 + (p // 10) % 20001 + 100 * (p % 1000)


def sparse_order_key(index: np.ndarray) -> np.ndarray:
    """Order index (1-based) -> sparse key: 8 keys per 32-key block
    (keys 1..7 then 32..39, 64..71, ... — low 3 bits of the index ride
    through, the rest shifts past 2 spare bits)."""
    i = index.astype(np.int64)
    return ((i >> 3) << 5) + (i & 7)


def permute_names(stream: Stream, n_words: int = 5) -> np.ndarray:
    """p_name: first ``n_words`` entries of a per-row Fisher-Yates
    permutation of the 92 colors (fresh identity each row; stream usage
    is the full 92 draws but FY never revisits settled positions, so
    only the first ``n_words`` swaps are needed — verified exact against
    dbgen output). Vectorized as gather/scatter steps over all rows."""
    n = len(stream.seeds)
    perm = np.tile(np.arange(len(COLORS), dtype=np.int64), (n, 1))
    rows = np.arange(n)
    for i in range(n_words):
        j = stream.draw(i, len(COLORS) - 1)
        pi = perm[rows, i].copy()
        perm[rows, i] = perm[rows, j]
        perm[rows, j] = pi
    color_arr = np.array(COLORS, dtype=object)
    out = np.empty(n, dtype=object)
    for r in range(n):
        out[r] = " ".join(color_arr[perm[r, :n_words]])
    return out


def _dates_from_offsets(offsets: np.ndarray) -> np.ndarray:
    return STARTDATE + offsets.astype("timedelta64[D]")


# --- table builders (pandas frames over a row range) ------------------------


def gen_part(sf: float, start: int = 0, count: int | None = None,
            pool_size: int | None = None):
    import pandas as pd

    n_total = _rows("part", sf)
    n = n_total - start if count is None else min(count, n_total - start)
    pk = np.arange(start + 1, start + n + 1, dtype=np.int64)
    name = permute_names(Stream("P_NAME", start, n))
    m = Stream("P_MFG", start, n).draw(1, 5)
    b = m * 10 + Stream("P_BRND", start, n).draw(1, 5)
    ptype = pick(Stream("P_TYPE", start, n), P_TYPES)
    size = Stream("P_SIZE", start, n).draw(1, 50)
    cntr = pick(Stream("P_CNTR", start, n), P_CNTRS)
    from glaredb_spark.sources.dbgen_text import text_column

    comment = text_column(Stream("P_CMNT", start, n), 14, **_pk(pool_size))
    return pd.DataFrame(
        {
            "p_partkey": pk,
            "p_name": name,
            "p_mfgr": np.array([f"Manufacturer#{x}" for x in m], dtype=object),
            "p_brand": np.array([f"Brand#{x}" for x in b], dtype=object),
            "p_type": ptype,
            "p_size": size.astype(np.int32),
            "p_container": cntr,
            "p_retailprice_cents": retail_price_cents(pk),
            "p_comment": comment,
        }
    )


def gen_supplier(sf: float, start: int = 0, count: int | None = None,
            pool_size: int | None = None):
    import pandas as pd

    n_total = _rows("supplier", sf)
    n = n_total - start if count is None else min(count, n_total - start)
    sk = np.arange(start + 1, start + n + 1, dtype=np.int64)
    addr = v_str(Stream("S_ADDR", start, n), 25)
    nk = Stream("S_NTRG", start, n).draw(0, 24)
    ph = phone(Stream("S_PHNE", start, n), nk)
    bal = Stream("S_ABAL", start, n).draw(-99999, 999999)
    from glaredb_spark.sources.dbgen_text import text_column

    comment = text_column(Stream("S_CMNT", start, n), 63, **_pk(pool_size))
    comment = _bbb_inject(comment, start, n)
    return pd.DataFrame(
        {
            "s_suppkey": sk,
            "s_name": np.array(
                [f"Supplier#{k:09d}" for k in sk], dtype=object
            ),
            "s_address": addr,
            "s_nationkey": nk.astype(np.int32),
            "s_phone": ph,
            "s_acctbal_cents": bal,
            "s_comment": comment,
        }
    )


def _bbb_inject(comments: np.ndarray, start: int, n: int) -> np.ndarray:
    """5-per-10000 suppliers get 'Customer ...Complaints/Recommends'
    spliced into their comment (q16's filter target)."""
    sel = Stream("BBB_CMNT", start, n).draw(1, 10000)
    jnk = Stream("BBB_JNK", start, n)
    off = Stream("BBB_OFFSET", start, n)
    typ = Stream("BBB_TYPE", start, n)
    base_text = "Customer "
    full_len = len(base_text) + len("Complaints")
    # every stream advances for every row (fixed usage); only selected
    # rows use the values
    j_raw = jnk.draw(0, M)
    o_raw = off.draw(0, M)
    t = typ.draw(0, 100)
    out = comments.copy()
    for r in np.nonzero(sel <= 10)[0]:
        c = out[r]
        noise = int(
            (float(j_raw[r] % M) / M) * (len(c) - full_len + 1)
        )
        offset = int(
            (float(o_raw[r] % M) / M) * (len(c) - (full_len + noise) + 1)
        )
        word = "Complaints" if t[r] < 50 else "Recommends"
        c = (
            c[:offset]
            + base_text
            + c[offset + len(base_text):]
        )
        pos = offset + len(base_text) + noise
        c = c[:pos] + word + c[pos + len(word):]
        out[r] = c
    return out


def gen_customer(sf: float, start: int = 0, count: int | None = None,
            pool_size: int | None = None):
    import pandas as pd

    n_total = _rows("customer", sf)
    n = n_total - start if count is None else min(count, n_total - start)
    ck = np.arange(start + 1, start + n + 1, dtype=np.int64)
    addr = v_str(Stream("C_ADDR", start, n), 25)
    nk = Stream("C_NTRG", start, n).draw(0, 24)
    ph = phone(Stream("C_PHNE", start, n), nk)
    bal = Stream("C_ABAL", start, n).draw(-99999, 999999)
    seg = pick(Stream("C_MSEG", start, n), SEGMENTS)
    from glaredb_spark.sources.dbgen_text import text_column

    comment = text_column(Stream("C_CMNT", start, n), 73, **_pk(pool_size))
    return pd.DataFrame(
        {
            "c_custkey": ck,
            "c_name": np.array(
                [f"Customer#{k:09d}" for k in ck], dtype=object
            ),
            "c_address": addr,
            "c_nationkey": nk.astype(np.int32),
            "c_phone": ph,
            "c_acctbal_cents": bal,
            "c_mktsegment": seg,
            "c_comment": comment,
        }
    )


NATION_ROWS = [
    (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1),
    (3, "CANADA", 1), (4, "EGYPT", 4), (5, "ETHIOPIA", 0),
    (6, "FRANCE", 3), (7, "GERMANY", 3), (8, "INDIA", 2),
    (9, "INDONESIA", 2), (10, "IRAN", 4), (11, "IRAQ", 4),
    (12, "JAPAN", 2), (13, "JORDAN", 4), (14, "KENYA", 0),
    (15, "MOROCCO", 0), (16, "MOZAMBIQUE", 0), (17, "PERU", 1),
    (18, "CHINA", 2), (19, "ROMANIA", 3), (20, "SAUDI ARABIA", 4),
    (21, "VIETNAM", 2), (22, "RUSSIA", 3), (23, "UNITED KINGDOM", 3),
    (24, "UNITED STATES", 1),
]

REGION_ROWS = [
    (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
    (4, "MIDDLE EAST"),
]


def gen_nation(sf: float = 1.0, start: int = 0, count: int | None = None,
           pool_size: int | None = None):
    """The 25 constant nation rows; comments from the text pool
    (N_CMNT stream, avg 72) — identical at every SF."""
    import pandas as pd

    from glaredb_spark.sources.dbgen_text import text_column

    comment = text_column(Stream("N_CMNT", 0, 25), 72, **_pk(pool_size))
    return pd.DataFrame(
        {
            "n_nationkey": np.array([r[0] for r in NATION_ROWS], np.int32),
            "n_name": np.array([r[1] for r in NATION_ROWS], object),
            "n_regionkey": np.array([r[2] for r in NATION_ROWS], np.int32),
            "n_comment": comment,
        }
    )


def gen_region(sf: float = 1.0, start: int = 0, count: int | None = None,
           pool_size: int | None = None):
    """The 5 constant region rows; comments from the text pool
    (R_CMNT stream, avg 72)."""
    import pandas as pd

    from glaredb_spark.sources.dbgen_text import text_column

    comment = text_column(Stream("R_CMNT", 0, 5), 72, **_pk(pool_size))
    return pd.DataFrame(
        {
            "r_regionkey": np.array([r[0] for r in REGION_ROWS], np.int32),
            "r_name": np.array([r[1] for r in REGION_ROWS], object),
            "r_comment": comment,
        }
    )


def gen_partsupp(sf: float, start: int = 0, count: int | None = None,
            pool_size: int | None = None):
    """Partsupp rows for PART rows [start, start+count): 4 suppliers per
    part, streams advance 4 (or 8 for comments) per part row."""
    import pandas as pd

    n_total = _rows("part", sf)
    n = n_total - start if count is None else min(count, n_total - start)
    pk = np.arange(start + 1, start + n + 1, dtype=np.int64)
    supp_count = _rows("supplier", sf)
    qty_s = Stream("PS_QTY", start, n)
    cost_s = Stream("PS_SCST", start, n)
    from glaredb_spark.sources.dbgen_text import text_columns_interleaved

    comments = text_columns_interleaved(
        Stream("PS_CMNT", start, n), 124, 4, **_pk(pool_size)
    )
    frames = {"ps_partkey": [], "ps_suppkey": [], "ps_availqty": [],
              "ps_supplycost_cents": [], "ps_comment": []}
    qty = np.empty((n, 4), dtype=np.int64)
    cost = np.empty((n, 4), dtype=np.int64)
    for i in range(4):
        qty[:, i] = qty_s.draw(1, 9999)
        cost[:, i] = cost_s.draw(100, 100000)
    for i in range(4):
        sk = (
            pk + i * (supp_count // 4 + (pk - 1) // supp_count)
        ) % supp_count + 1
        frames["ps_partkey"].append(pk)
        frames["ps_suppkey"].append(sk)
        frames["ps_availqty"].append(qty[:, i])
        frames["ps_supplycost_cents"].append(cost[:, i])
        frames["ps_comment"].append(comments[:, i])
    # interleave: part 1's 4 suppliers first, then part 2's ...
    order = np.arange(n * 4).reshape(4, n).T.reshape(-1)
    df = pd.DataFrame(
        {k: np.concatenate(v) for k, v in frames.items()}
    )
    return df.iloc[order].reset_index(drop=True)


def _order_block(sf: float, start: int, n: int):
    """Shared per-order computation for orders AND lineitem: dates,
    line counts, and every per-line stream (usage keyed to order rows),
    so the two tables agree without a join."""
    cust_count = _rows("customer", sf)
    part_count = _rows("part", sf)
    supp_count = _rows("supplier", sf)
    okey = sparse_order_key(
        np.arange(start + 1, start + n + 1, dtype=np.int64)
    )
    ck = Stream("O_CKEY", start, n).draw(1, cust_count)
    # skip custkey % 3 == 0 by dbgen's +1/-1 mortality walk: +1 always
    # escapes (ck≡0 → ck+1≡1) except at the cap, where the walk caps
    # then steps back to max-1
    bad = ck % 3 == 0
    ck = np.where(bad, np.where(ck == cust_count, ck - 1, ck + 1), ck)
    odate_off = Stream("O_ODATE", start, n).draw(0, ODATE_SPAN - 1)
    prio = pick(Stream("O_PRIO", start, n), PRIORITIES)
    clerk_scale = max(int(sf * 1000), 1000)
    clerk = Stream("O_CLRK", start, n).draw(1, clerk_scale)
    lcnt = Stream("O_LCNT", start, n).draw(1, 7)
    qty = _seven(Stream("L_QTY", start, n), 1, 50)
    disc = _seven(Stream("L_DCNT", start, n), 0, 10)
    tax = _seven(Stream("L_TAX", start, n), 0, 8)
    pkey = _seven(Stream("L_PKEY", start, n), 1, part_count)
    skey_i = _seven(Stream("L_SKEY", start, n), 0, 3)
    sdte = _seven(Stream("L_SDTE", start, n), 1, 121)
    cdte = _seven(Stream("L_CDTE", start, n), 30, 90)
    rdte = _seven(Stream("L_RDTE", start, n), 1, 30)
    rflg = _seven(Stream("L_RFLG", start, n), 0, 1)
    instr = _seven(Stream("L_SHIP", start, n), 0, len(INSTRUCTIONS) - 1)
    smode = _seven(Stream("L_SMODE", start, n), 0, len(SHIP_MODES) - 1)
    skey = (
        pkey + skey_i * (supp_count // 4 + (pkey - 1) // supp_count)
    ) % supp_count + 1
    ship_off = odate_off[:, None] + sdte
    commit_off = odate_off[:, None] + cdte
    receipt_off = ship_off + rdte
    eprice = qty * retail_price_cents(pkey)
    line_mask = np.arange(7)[None, :] < lcnt[:, None]
    # o_totalprice: dbgen's integer-cents fold with truncating division
    disc_price = (eprice * (100 - disc)) // 100
    charged = (disc_price * (100 + tax)) // 100
    total = np.where(line_mask, charged, 0).sum(axis=1)
    # statuses
    linestatus_O = ship_off > CURRENTDATE_OFF
    # dbgen only draws the returnflag pick for lines with receipt <=
    # CURRENTDATE ("N" lines consume NO draw; build.c's mk_order guards
    # the pick_str call), so line i's draw index within the order is the
    # count of PRIOR eligible lines, not i.
    elig = receipt_off <= CURRENTDATE_OFF
    rflg_idx = np.cumsum(elig, axis=1) - elig
    rflg_used = np.take_along_axis(rflg, rflg_idx, axis=1)
    returnflag = np.where(
        elig,
        np.where(rflg_used == 0, "R", "A"),
        "N",
    )
    n_open = np.where(line_mask, linestatus_O, False).sum(axis=1)
    ostatus = np.where(
        n_open == lcnt, "O", np.where(n_open == 0, "F", "P")
    )
    return {
        "okey": okey, "ck": ck, "odate_off": odate_off, "prio": prio,
        "clerk": clerk, "lcnt": lcnt, "qty": qty, "disc": disc,
        "tax": tax, "pkey": pkey, "skey": skey, "ship_off": ship_off,
        "commit_off": commit_off, "receipt_off": receipt_off,
        "eprice": eprice, "line_mask": line_mask, "total": total,
        "ostatus": ostatus, "returnflag": returnflag,
        "linestatus_O": linestatus_O, "instr": instr, "smode": smode,
        "start": start, "n": n,
    }


def _seven(stream: Stream, low: int, high: int) -> np.ndarray:
    """7 sequential draws per order row (max line count), as columns."""
    n = len(stream.seeds)
    out = np.empty((n, 7), dtype=np.int64)
    for i in range(7):
        out[:, i] = stream.draw(low, high)
    return out


def gen_orders(sf: float, start: int = 0, count: int | None = None,
            pool_size: int | None = None):
    import pandas as pd

    n_total = _rows("orders", sf)
    n = n_total - start if count is None else min(count, n_total - start)
    b = _order_block(sf, start, n)
    from glaredb_spark.sources.dbgen_text import text_column

    comment = text_column(Stream("O_CMNT", start, n), 49, **_pk(pool_size))
    return pd.DataFrame(
        {
            "o_orderkey": b["okey"],
            "o_custkey": b["ck"],
            "o_orderstatus": b["ostatus"],
            "o_totalprice_cents": b["total"],
            "o_orderdate": _dates_from_offsets(b["odate_off"]),
            "o_orderpriority": b["prio"],
            "o_clerk": np.array(
                [f"Clerk#{c:09d}" for c in b["clerk"]], dtype=object
            ),
            "o_shippriority": np.zeros(n, dtype=np.int32),
            "o_comment": comment,
        }
    )


def gen_lineitem(sf: float, start: int = 0, count: int | None = None,
            pool_size: int | None = None):
    """Lineitem rows for ORDER rows [start, start+count)."""
    import pandas as pd

    n_total = _rows("orders", sf)
    n = n_total - start if count is None else min(count, n_total - start)
    b = _order_block(sf, start, n)
    from glaredb_spark.sources.dbgen_text import text_columns_interleaved

    comments = text_columns_interleaved(Stream("L_CMNT", start, n), 27, 7,
                                        **_pk(pool_size))
    mask = b["line_mask"]
    rows, lines = np.nonzero(mask)
    return pd.DataFrame(
        {
            "l_orderkey": b["okey"][rows],
            "l_partkey": b["pkey"][rows, lines],
            "l_suppkey": b["skey"][rows, lines],
            "l_linenumber": (lines + 1).astype(np.int32),
            "l_quantity": b["qty"][rows, lines],
            "l_extendedprice_cents": b["eprice"][rows, lines],
            "l_discount_cents": b["disc"][rows, lines],
            "l_tax_cents": b["tax"][rows, lines],
            "l_returnflag": b["returnflag"][rows, lines],
            "l_linestatus": np.where(
                b["linestatus_O"][rows, lines], "O", "F"
            ),
            "l_shipdate": _dates_from_offsets(b["ship_off"][rows, lines]),
            "l_commitdate": _dates_from_offsets(
                b["commit_off"][rows, lines]
            ),
            "l_receiptdate": _dates_from_offsets(
                b["receipt_off"][rows, lines]
            ),
            "l_shipinstruct": np.array(INSTRUCTIONS, dtype=object)[
                b["instr"][rows, lines]
            ],
            "l_shipmode": np.array(SHIP_MODES, dtype=object)[
                b["smode"][rows, lines]
            ],
            "l_comment": comments[rows, lines],
        }
    )
