"""Deterministic small-scale TPC-DS dataset for DIFFERENTIAL testing.

The reference parks its slt/tpcds suite (68 of 99 query files have empty
goldens — its own planner timed out before authoring them; see
COVERAGE.md), so beyond the golden-checked files there is nothing to
assert values against. This module closes that differently: a seeded,
schema-exact dataset over all 24 tables (schemas from describe_files.slt
via parquet_testing.tpcds_schemas) with the FK correlations the queries
join on — every fact *_sk samples a real dimension key, returns
reference EXISTING sale line items (same item + ticket/order number),
date_dim is a real 1998-2002 calendar (julian-style d_date_sk,
d_month_seq = (y-1900)*12+m-1 — so the queries' `d_month_seq BETWEEN
1200 AND 1211` windows hit), and string domains come from the literal
pools the 99 queries actually filter on (i_category, cd_gender,
d_day_name, ...). tests/test_tpcds_differential.py then runs each query
through BOTH this engine and DuckDB on the same parquet and compares
values — the strongest check available for queries whose reference
goldens were never written.

Scale note: this is a correctness fixture (few thousand fact rows), not
a benchmark input; generation is pure-python + pyarrow, no Spark.
"""

from __future__ import annotations

import datetime
import decimal
import os
import random

JULIAN_1998 = 2450815  # d_date_sk of 1998-01-01, the dsdgen convention
_DAYS = 365 * 5 + 1  # 1998-01-01 .. 2002-12-31

# literal domains the 99 query files filter on (extracted from their
# predicates; values not covered here make those filters empty on BOTH
# engines, which still compares equal but asserts less)
_POOLS: dict[str, list[str]] = {
    "cd_gender": ["F", "M"],
    "cd_marital_status": ["D", "M", "S", "W", "U"],
    "cd_education_status": [
        "2 yr Degree", "4 yr Degree", "Advanced Degree", "College",
        "Unknown", "Primary", "Secondary",
    ],
    "cd_credit_rating": ["Good", "High Risk", "Low Risk", "Unknown"],
    "s_state": ["TN", "SD", "AL", "GA"],
    "s_store_name": ["ese", "ation", "able", "ought", "bar"],
    "s_county": ["Williamson County", "Ziebach County"],
    "s_city": ["Fairview", "Midway", "Edgewood"],
    "cc_county": ["Williamson County", "Ziebach County"],
    "cc_class": ["small", "medium", "large"],
    "d_day_name": [],  # authored by the calendar builder
    "i_category": [
        "Books", "Electronics", "Jewelry", "Men", "Music", "Sports",
        "Women", "Children", "Home", "Shoes",
    ],
    "i_class": [
        "accessories", "birdal", "classical", "computers", "dresses",
        "football", "fragrances", "maternity", "pants", "shirts",
        "stereo", "personal", "portable",
    ],
    "i_brand": [
        "amalgimporto #1", "edu packscholar #1", "exportiimporto #1",
        "importoamalg #1", "scholaramalgamalg #9", "corpunivamalg #6",
    ],
    "i_color": [
        "brown", "cornflower", "cyan", "deep", "floral", "forest",
        "frosted", "ghost", "honeydew", "khaki", "light", "midnight",
        "orange", "papaya", "peach", "powder", "snow", "red", "blue",
        "slate", "blanched", "burlywood", "purple",
    ],
    "i_units": [
        "Box", "Bunch", "Bundle", "Cup", "Dozen", "Dram", "Each",
        "Gross", "Lb", "N/A", "Ounce", "Oz", "Pallet", "Pound", "Tbl",
        "Ton", "Unknown",
    ],
    "i_size": [
        "N/A", "extra large", "medium", "petite", "small", "large",
        "economy",
    ],
    "ca_state": [
        "GA", "IL", "KY", "MS", "NM", "OH", "OR", "TX", "VA", "TN",
        "CA", "WA", "NC", "OK", "FL", "IN", "SC",
    ],
    "ca_city": ["Edgewood", "Fairview", "Midway", "Oak Grove",
                "Riverside"],
    "ca_county": ["Williamson County", "Ziebach County", "Walker County",
                  "Richland County", "Gaines County"],
    "ca_country": ["United States"],
    "ca_zip": [
        "85669", "86197", "88274", "83405", "86475", "85392", "85460",
        "80348", "81792", "24128", "76232", "65084", "87816", "83926",
        "77556", "20548", "26231", "43848", "15126", "91137", "35460",
    ],
    "ca_location_type": ["apartment", "condo", "single family"],
    "ca_street_type": ["Street", "Ave", "Blvd", "Way", "Ct"],
    "c_preferred_cust_flag": ["Y", "N"],
    "c_birth_country": ["UNITED STATES", "CANADA", "MEXICO", "GERMANY",
                        "JAPAN"],
    "c_salutation": ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"],
    "c_first_name": ["James", "Mary", "John", "Linda", "Robert",
                     "Susan", "David", "Sarah"],
    "c_last_name": ["Smith", "Jones", "Brown", "White", "Moore",
                    "Clark", "Lewis", "Young"],
    "hd_buy_potential": [">10000", "Unknown", "1001-5000", "0-500",
                         "501-1000", "5001-10000"],
    "p_channel_email": ["N", "Y"],
    "p_channel_event": ["N", "Y"],
    "p_channel_tv": ["N", "Y"],
    "p_channel_dmail": ["Y", "N"],
    "web_company_name": ["pri", "able", "ese", "anti", "cally"],
    "sm_carrier": ["BARIAN", "DHL", "UPS", "FEDEX", "AIRBORNE"],
    "sm_type": ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR",
                "TWO DAY", "LIBRARY"],
    "t_meal_time": ["breakfast", "dinner", "lunch"],
    "t_am_pm": ["AM", "PM"],
    "t_shift": ["first", "second", "third"],
    "t_sub_shift": ["morning", "afternoon", "evening", "night"],
    "r_reason_desc": ["reason 28", "reason 1", "reason 2", "reason 3"],
    "i_manufact": ["oughtbar", "ableoughtn st", "pribarable",
                   "eseoughteing"],
    "s_gmt_offset": [],  # numeric; handled below
    "w_state": ["TN", "GA", "AL"],
    "w_county": ["Williamson County", "Ziebach County"],
    "wp_char_count": [],
}

_ROWS = {
    "date_dim": _DAYS,
    "time_dim": 1440,  # one per minute of day
    "item": 120,
    "customer": 250,
    "customer_address": 250,
    "customer_demographics": 140,  # 2 x (gender x marital x education)
    "household_demographics": 120,
    "income_band": 20,
    "store": 12,
    "call_center": 6,
    "catalog_page": 30,
    "warehouse": 6,
    "web_page": 12,
    "web_site": 8,
    "ship_mode": 12,
    "reason": 12,
    "promotion": 24,
    "store_sales": 10000,
    "catalog_sales": 7500,
    "web_sales": 7500,
    "store_returns": 2000,
    "catalog_returns": 1500,
    "web_returns": 1500,
    "inventory": 5200,
}

# per-line-group SHARED columns: a real ticket/order's lines share the
# sale's date/time/parties/store — without this every line draws its
# own customer and the basket-count queries (HAVING cnt BETWEEN 15 AND
# 20 grouped by ticket+customer) can never see a basket bigger than a
# coincidence (r13 depth work)
_GROUP_SHARED = {
    "store_sales": (
        "ss_sold_date_sk", "ss_sold_time_sk", "ss_customer_sk",
        "ss_cdemo_sk", "ss_hdemo_sk", "ss_addr_sk", "ss_store_sk",
    ),
    "catalog_sales": (
        "cs_sold_date_sk", "cs_sold_time_sk", "cs_ship_date_sk",
        "cs_bill_customer_sk", "cs_bill_cdemo_sk", "cs_bill_hdemo_sk",
        "cs_bill_addr_sk", "cs_ship_customer_sk", "cs_ship_cdemo_sk",
        "cs_ship_hdemo_sk", "cs_ship_addr_sk", "cs_call_center_sk",
        "cs_ship_mode_sk", "cs_warehouse_sk",
    ),
    "web_sales": (
        "ws_sold_date_sk", "ws_sold_time_sk", "ws_ship_date_sk",
        "ws_bill_customer_sk", "ws_bill_cdemo_sk", "ws_bill_hdemo_sk",
        "ws_bill_addr_sk", "ws_ship_customer_sk", "ws_ship_cdemo_sk",
        "ws_ship_hdemo_sk", "ws_ship_addr_sk", "ws_web_site_sk",
        "ws_ship_mode_sk", "ws_warehouse_sk",
    ),
}

# fact FK suffix -> dimension whose key range it samples
_FK = {
    "_item_sk": "item",
    "_customer_sk": "customer",
    "_cdemo_sk": "customer_demographics",
    "_hdemo_sk": "household_demographics",
    "_addr_sk": "customer_address",
    "_store_sk": "store",
    "_call_center_sk": "call_center",
    "_catalog_page_sk": "catalog_page",
    "_warehouse_sk": "warehouse",
    "_web_page_sk": "web_page",
    "_web_site_sk": "web_site",
    "_ship_mode_sk": "ship_mode",
    "_reason_sk": "reason",
    "_promo_sk": "promotion",
    "_income_band_sk": "income_band",
}


def _calendar(i: int) -> dict:
    d = datetime.date(1998, 1, 1) + datetime.timedelta(days=i)
    names = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]
    month_seq = (d.year - 1900) * 12 + d.month - 1
    return {
        "d_date_sk": JULIAN_1998 + i,
        "d_date_id": f"AAAAAAAA{JULIAN_1998 + i}",
        "d_date": d,
        "d_month_seq": month_seq,
        "d_week_seq": (i + 3) // 7 + 5113,  # 1998-01-01 was a Thursday
        "d_quarter_seq": (d.year - 1900) * 4 + (d.month - 1) // 3,
        "d_year": d.year,
        "d_dow": d.isoweekday() % 7,  # dsdgen: Sunday=0
        "d_moy": d.month,
        "d_dom": d.day,
        "d_qoy": (d.month - 1) // 3 + 1,
        "d_fy_year": d.year,
        "d_fy_quarter_seq": (d.year - 1900) * 4 + (d.month - 1) // 3,
        "d_fy_week_seq": (i + 3) // 7 + 5113,
        "d_day_name": names[d.weekday()],
        "d_quarter_name": f"{d.year}Q{(d.month - 1) // 3 + 1}",
        "d_holiday": "Y" if (d.month, d.day) in ((1, 1), (7, 4),
                                                 (12, 25)) else "N",
        "d_weekend": "Y" if d.weekday() >= 5 else "N",
        "d_following_holiday": "Y" if (d.month, d.day) in (
            (1, 2), (7, 5), (12, 26)) else "N",
        "d_first_dom": JULIAN_1998 + i - d.day + 1,
        "d_last_dom": JULIAN_1998 + i,  # approximation dsdgen also fudges
        "d_same_day_ly": JULIAN_1998 + i - 365,
        "d_same_day_lq": JULIAN_1998 + i - 91,
        "d_current_day": "N",
        "d_current_week": "N",
        "d_current_month": "N",
        "d_current_quarter": "N",
        "d_current_year": "N",
    }


def _cd_row(i: int) -> dict:
    """customer_demographics is a CROSS-PRODUCT dimension in dsdgen —
    enumerate (gender x marital x education) so every filter combo the
    queries name exists (random draws left ~30% of combos absent and
    emptied the cd-triple queries)."""
    g = _POOLS["cd_gender"][i % 2]
    m = _POOLS["cd_marital_status"][(i // 2) % 5]
    e = _POOLS["cd_education_status"][(i // 10) % 7]
    return {
        "cd_demo_sk": i + 1,
        "cd_gender": g,
        "cd_marital_status": m,
        "cd_education_status": e,
        "cd_purchase_estimate": 500 + (i % 20) * 500,
        "cd_credit_rating": _POOLS["cd_credit_rating"][i % 4],
        "cd_dep_count": i % 7,
        "cd_dep_employed_count": (i // 7) % 5,
        "cd_dep_college_count": (i // 35) % 4,
    }


def _hd_row(i: int) -> dict:
    """household_demographics: enumerate buy_potential x dep_count x
    vehicle_count so ratio filters (dep/vehicle > 1, vehicle = 3, ...)
    always have qualifying rows."""
    return {
        "hd_demo_sk": i + 1,
        "hd_income_band_sk": (i % 20) + 1,
        "hd_buy_potential": _POOLS["hd_buy_potential"][i % 6],
        "hd_dep_count": (i // 6) % 10,
        "hd_vehicle_count": (i // 2) % 5,
    }


def _time_row(i: int) -> dict:
    sec = i * 60  # one row per minute
    h, rem = divmod(sec, 3600)
    m, s = divmod(rem, 60)
    return {
        "t_time_sk": sec,
        "t_time_id": f"AAAAAAAA{sec}",
        "t_time": sec,
        "t_hour": h,
        "t_minute": m,
        "t_second": s,
        "t_am_pm": "AM" if h < 12 else "PM",
        "t_shift": "first" if h < 8 else ("second" if h < 16 else
                                          "third"),
        "t_sub_shift": ["morning", "afternoon", "evening",
                        "night"][h // 6],
        "t_meal_time": ("breakfast" if 6 <= h <= 9 else
                        "lunch" if 11 <= h <= 13 else
                        "dinner" if 17 <= h <= 20 else None),
    }


def _dec(rng: random.Random, lo: float, hi: float) -> decimal.Decimal:
    return decimal.Decimal(rng.randrange(int(lo * 100),
                                         int(hi * 100))) / 100


def _generic(col: str, typ: str, i: int, rng: random.Random, nrows: int):
    """Value for a column no special rule claims."""
    if typ == "Date32":
        return datetime.date(1998, 1, 1) + datetime.timedelta(
            days=rng.randrange(_DAYS)
        )
    if typ.startswith("Decimal"):
        if col.endswith("_gmt_offset"):
            return decimal.Decimal(rng.choice([-5, -6, -7, -8]))
        if "percentage" in col or col.endswith("_tax_percentage"):
            return _dec(rng, 0, 0.12)
        if col == "i_current_price":
            # the price-window filters (BETWEEN 62 AND 92, ...) live
            # under 100; q21's band is 0.99..1.49, so pin some items
            # inside it
            if rng.random() < 0.12:
                return _dec(rng, 0.99, 1.49)
            return _dec(rng, 0.09, 99)
        return _dec(rng, 0, 1500)
    if typ == "Int32":
        if col.endswith("_quantity_on_hand"):
            # the inventory-window queries filter 100..500
            return rng.randrange(0, 1001)
        if col.endswith("_quantity") or col.endswith("_return_quantity"):
            return rng.randrange(1, 101)
        if col.endswith("_birth_year"):
            return rng.randrange(1924, 1993)
        if col.endswith("_birth_month"):
            return rng.randrange(1, 13)
        if col.endswith("_birth_day"):
            return rng.randrange(1, 29)
        if col.endswith("_dep_count") or col.endswith("_vehicle_count"):
            return rng.randrange(0, 10)
        if col.endswith("_manager_id"):
            # weight toward the ids the queries name
            return rng.choice([1, 8, 28, rng.randrange(1, 101)])
        if col.endswith(("_brand_id", "_class_id", "_category_id")):
            return rng.randrange(1, 17)
        if col.endswith("_manufact_id"):
            # half the items land on the ids the queries name, so
            # manufact-filtered plans have rows to return
            return rng.choice([
                128, 350, 738, 977,      # the = literals
                677, 940, 694, 808,      # q37's IN list
                129, 270, 821, 423,      # q82's IN list
                rng.randrange(1, 1001),
            ])
        if col == "s_market_id":
            return rng.randrange(1, 11)
        if col == "wp_char_count":
            return rng.randrange(4800, 5501)
        if col == "ib_lower_bound":
            return (i % 20) * 10000
        if col == "ib_upper_bound":
            return (i % 20) * 10000 + 10000
        if col.endswith("_employees"):
            return rng.randrange(200, 300)
        if col.endswith("_sq_ft"):
            return rng.randrange(5000, 9000)
        return rng.randrange(0, 120)
    # Utf8
    pool = _POOLS.get(col)
    if pool:
        # the first len(pool) rows ENUMERATE the pool, so every literal
        # the queries filter on is guaranteed to exist even in small
        # dimensions (an unlucky draw once left 'reason 28' out of the
        # 12-row reason table and emptied q93); later rows draw freely
        return pool[i] if i < len(pool) else rng.choice(pool)
    if col.endswith("_id"):
        return f"{col[:2].upper()}{i:014d}"
    if col.endswith("_zip"):
        return rng.choice(_POOLS["ca_zip"])
    if col.endswith("_email_address"):
        return f"user{i}@example.{rng.choice(['com', 'org'])}"
    if col.endswith("_product_name") or col.endswith("_name"):
        return f"{col.split('_')[-1]} {i % 37}"
    if col.endswith("_desc") or col.endswith("_description"):
        return f"{col} text {i % 23}"
    if col.endswith("_hours"):
        return rng.choice(["8AM-4PM", "8AM-12AM", "8AM-8AM"])
    if col.endswith("_street_number") or col.endswith("_suite_number"):
        return str(rng.randrange(1, 999))
    return f"{col.split('_', 1)[-1]}{i % 13}"


def _fk_for(col: str) -> "str | None":
    for suf, dim in _FK.items():
        if col.endswith(suf):
            return dim
    return None


def ensure(root: str) -> dict[str, str]:
    """Generate (once) the 24 parquet tables under ``root``; returns
    table -> path. Deterministic: same seed, same bytes-independent
    values (parquet metadata may differ run to run; values never)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glaredb_spark.sources.parquet_testing import tpcds_schemas

    os.makedirs(root, exist_ok=True)
    schemas = tpcds_schemas()
    out = {t: os.path.join(root, f"{t}.parquet") for t in schemas}
    if all(os.path.exists(p) for p in out.values()):
        return out
    rng = random.Random(20130)
    date_sks = [JULIAN_1998 + i for i in range(_DAYS)]
    time_sks = [i * 60 for i in range(_ROWS["time_dim"])]

    def fact_date(rng):
        # concentrate on the 1998-2002 window the filters target
        return rng.choice(date_sks)

    rows_by_table: dict[str, list[dict]] = {}

    def build(table: str) -> list[dict]:
        cols = schemas[table]
        n = _ROWS[table]
        # variable ticket/order sizes (1..25 lines): the cnt-window
        # queries (q34/q73-style HAVING cnt BETWEEN 15 AND 20) need
        # some large baskets to exist
        group_no, g = [], 0
        while len(group_no) < n:
            g += 1
            group_no.extend([g] * rng.randrange(1, 26))
        group_shared: dict[int, dict] = {}
        rows = []
        for i in range(n):
            if table == "date_dim":
                rows.append(_calendar(i))
                continue
            if table == "time_dim":
                rows.append(_time_row(i))
                continue
            if table == "customer_demographics":
                rows.append(_cd_row(i))
                continue
            if table == "household_demographics":
                rows.append(_hd_row(i))
                continue
            r: dict = {}
            shared_cols = _GROUP_SHARED.get(table, ())
            g = group_no[i] if shared_cols else None
            for c, typ in cols:
                dim = _fk_for(c)
                # a table's OWN key is its first column — but facts
                # start with a date FK, so the date/time rules win
                first_sk = (
                    c == cols[0][0] and c.endswith("_sk")
                    and not c.endswith(("_date_sk", "_time_sk"))
                )
                if first_sk:
                    r[c] = i + 1
                elif c.endswith("_date_sk"):
                    if table == "inventory":
                        # weekly snapshots (dsdgen convention): dense
                        # per-(item, warehouse, week) buckets, and the
                        # week-seq equality joins (q72) can match
                        r[c] = JULIAN_1998 + (
                            rng.randrange(_DAYS) // 7
                        ) * 7
                    else:
                        r[c] = fact_date(rng)
                elif c.endswith("_time_sk"):
                    r[c] = rng.choice(time_sks)
                elif dim is not None:
                    r[c] = rng.randrange(1, _ROWS[dim] + 1)
                elif c.endswith("_sk"):
                    r[c] = rng.randrange(1, 100)
                elif c == "ss_ticket_number" or c in (
                        "cs_order_number", "ws_order_number"):
                    r[c] = group_no[i]
                else:
                    r[c] = _generic(c, typ, i, rng, n)
                # a ticket/order's lines SHARE the sale-level columns;
                # the NULL chance applies at the GROUP level (a basket
                # sold with no recorded store/customer — the channel-
                # union queries filter ON these NULL keys, q76)
                if g is not None and c in shared_cols:
                    gv = group_shared.setdefault(g, {})
                    if c not in gv:
                        gv[c] = None if (
                            not c.endswith("_date_sk")
                            and rng.random() < 0.04
                        ) else r[c]
                    r[c] = gv[c]
                # sparse NULLs in nullable fact measures/FKs (never in
                # line identity, group-shared sale columns, or the
                # primary key — a NULL on one line of a shared column
                # would break the basket grouping)
                if (
                    table.endswith(("_sales", "_returns"))
                    and not first_sk
                    and c not in shared_cols
                    and c not in ("ss_ticket_number", "cs_order_number",
                                  "ws_order_number", "ss_item_sk",
                                  "cs_item_sk", "ws_item_sk",
                                  "sr_item_sk", "cr_item_sk",
                                  "wr_item_sk")
                    and rng.random() < 0.03
                ):
                    r[c] = None
            rows.append(r)
        return rows

    dims = [t for t in schemas if not t.endswith(("_sales", "_returns"))]
    for t in dims:
        rows_by_table[t] = build(t)
    for t in ("store_sales", "catalog_sales", "web_sales", "inventory"):
        rows_by_table[t] = build(t)
    # cross-channel overlap: the multi-channel queries (q10/q23/q25/
    # q29/q64-style) join the SAME customer buying the SAME item across
    # channels — give a third of catalog/web lines a store-sales
    # (customer, item) pair. Same-order lines keep their order number,
    # so the returns link below stays consistent.
    ss_rows = rows_by_table["store_sales"]
    for t, cust_col, item_col, order_col in (
        ("catalog_sales", "cs_bill_customer_sk", "cs_item_sk",
         "cs_order_number"),
        ("web_sales", "ws_bill_customer_sk", "ws_item_sk",
         "ws_order_number"),
    ):
        by_order: dict[int, list[dict]] = {}
        for r in rows_by_table[t]:
            by_order.setdefault(r[order_col], []).append(r)
        for lines in by_order.values():
            if rng.random() < 0.33:
                # whole-order patch: intra-order customer consistency
                # survives; each line gets its own store item
                src = rng.choice(ss_rows)
                cust = src["ss_customer_sk"]
                for line in lines:
                    if cust is not None:
                        line[cust_col] = cust
                    item = rng.choice(ss_rows)["ss_item_sk"]
                    if item is not None:
                        line[item_col] = item
    # returns reference EXISTING sale line items so the (item, ticket/
    # order) return joins the queries perform are non-empty
    link = {
        "store_returns": ("store_sales", "ss", "sr", "ss_ticket_number",
                          "sr_ticket_number"),
        "catalog_returns": ("catalog_sales", "cs", "cr",
                            "cs_order_number", "cr_order_number"),
        "web_returns": ("web_sales", "ws", "wr", "ws_order_number",
                        "wr_order_number"),
    }
    for t, (sales_t, sp, rp, s_no, r_no) in link.items():
        rows = build(t)
        sales = rows_by_table[sales_t]
        for r in rows:
            s = rng.choice(sales)
            r[f"{rp}_item_sk"] = s[f"{sp}_item_sk"]
            if r_no in r:
                r[r_no] = s[s_no]
            # return shortly after the sale, customer carried over
            sold = s[f"{sp}_sold_date_sk"]
            if sold is not None:
                r[f"{rp}_returned_date_sk"] = min(
                    sold + rng.randrange(1, 61), date_sks[-1]
                )
            for src, dst in (
                (f"{sp}_customer_sk", f"{rp}_customer_sk"),
                ("ss_customer_sk", "sr_customer_sk"),
                ("cs_bill_customer_sk", "cr_returning_customer_sk"),
                ("ws_bill_customer_sk", "wr_returning_customer_sk"),
            ):
                if src in s and dst in r and s[src] is not None:
                    r[dst] = s[src]
        rows_by_table[t] = rows

    _PA = {
        "Int32": pa.int32(),
        "Utf8": pa.string(),
        "Date32": pa.date32(),
        "Decimal128(5,2)": pa.decimal128(5, 2),
        "Decimal128(7,2)": pa.decimal128(7, 2),
        "Decimal64(15,2)": pa.decimal128(15, 2),
    }
    for t, rows in rows_by_table.items():
        cols = schemas[t]
        arrays = []
        for c, typ in cols:
            vals = [r.get(c) for r in rows]
            if typ.startswith("Decimal"):
                q = decimal.Decimal(1).scaleb(
                    -int(typ.split(",")[1].rstrip(")"))
                )
                vals = [
                    None if v is None
                    else decimal.Decimal(v).quantize(q)
                    for v in vals
                ]
            arrays.append(pa.array(vals, type=_PA[typ]))
        pq.write_table(
            pa.table(dict(zip([c for c, _ in cols], arrays))),
            out[t] + ".tmp", compression="snappy",
        )
        os.replace(out[t] + ".tmp", out[t])
    return out
