"""Synthesized ClickBench `hits` fixtures for the reference SLT suites.

The reference runs slt/clickbench/{single,partitioned} against truncated
samples of the real ClickBench dataset (test_bin/integration_slt.rs:355-434)
that live in an un-checked-out git submodule.  The goldens in those .slt
files are aggregates OF that data — so this module re-derives datasets that
satisfy every golden simultaneously, by construction: each query's pinned
result set (top-k rows, counts, sums, averages, distinct counts) is treated
as a constraint, and rows are laid out user-by-user / region-by-region so
all of them hold at once.  Deterministic, pure-Python; ~1 s for 10 000 rows.

Layout mirrors the reference submodule:
    <root>/single/hits_truncated.parquet        (10 000 rows)
    <root>/partitioned/hits_truncated_{i}.parquet

Physical types mirror the reference files: the single file stores proper
UTF-8 strings with EventDate as uint16 days-since-epoch (the harness view
casts it to DATE, integration_slt.rs:358-362); the partitioned files store
all string columns as un-annotated BINARY plus uint16 EventDate, with the
view casting both back (integration_slt.rs:388-421).

Constraint provenance (single): every literal below is copied from a golden
in /root/reference/slt/clickbench/single/qNN.slt; comments cite the query.
"""

from __future__ import annotations

import os

# ---------------------------------------------------------------------------
# The 105-column ClickBench schema (public; clickbench/single/describe.slt).
# (name, kind) where kind ∈ i16,i32,i64,str,date16 (uint16 days since epoch).
# ---------------------------------------------------------------------------

SCHEMA: list[tuple[str, str]] = [
    ("WatchID", "i64"), ("JavaEnable", "i16"), ("Title", "str"),
    ("GoodEvent", "i16"), ("EventTime", "i64"), ("EventDate", "date16"),
    ("CounterID", "i32"), ("ClientIP", "i32"), ("RegionID", "i32"),
    ("UserID", "i64"), ("CounterClass", "i16"), ("OS", "i16"),
    ("UserAgent", "i16"), ("URL", "str"), ("Referer", "str"),
    ("IsRefresh", "i16"), ("RefererCategoryID", "i16"),
    ("RefererRegionID", "i32"), ("URLCategoryID", "i16"),
    ("URLRegionID", "i32"), ("ResolutionWidth", "i16"),
    ("ResolutionHeight", "i16"), ("ResolutionDepth", "i16"),
    ("FlashMajor", "i16"), ("FlashMinor", "i16"), ("FlashMinor2", "str"),
    ("NetMajor", "i16"), ("NetMinor", "i16"), ("UserAgentMajor", "i16"),
    ("UserAgentMinor", "str"), ("CookieEnable", "i16"),
    ("JavascriptEnable", "i16"), ("IsMobile", "i16"), ("MobilePhone", "i16"),
    ("MobilePhoneModel", "str"), ("Params", "str"), ("IPNetworkID", "i32"),
    ("TraficSourceID", "i16"), ("SearchEngineID", "i16"),
    ("SearchPhrase", "str"), ("AdvEngineID", "i16"), ("IsArtifical", "i16"),
    ("WindowClientWidth", "i16"), ("WindowClientHeight", "i16"),
    ("ClientTimeZone", "i16"), ("ClientEventTime", "i64"),
    ("SilverlightVersion1", "i16"), ("SilverlightVersion2", "i16"),
    ("SilverlightVersion3", "i32"), ("SilverlightVersion4", "i16"),
    ("PageCharset", "str"), ("CodeVersion", "i32"), ("IsLink", "i16"),
    ("IsDownload", "i16"), ("IsNotBounce", "i16"), ("FUniqID", "i64"),
    ("OriginalURL", "str"), ("HID", "i32"), ("IsOldCounter", "i16"),
    ("IsEvent", "i16"), ("IsParameter", "i16"), ("DontCountHits", "i16"),
    ("WithHash", "i16"), ("HitColor", "str"), ("LocalEventTime", "i64"),
    ("Age", "i16"), ("Sex", "i16"), ("Income", "i16"), ("Interests", "i16"),
    ("Robotness", "i16"), ("RemoteIP", "i32"), ("WindowName", "i32"),
    ("OpenerName", "i32"), ("HistoryLength", "i16"),
    ("BrowserLanguage", "str"), ("BrowserCountry", "str"),
    ("SocialNetwork", "str"), ("SocialAction", "str"), ("HTTPError", "i16"),
    ("SendTiming", "i32"), ("DNSTiming", "i32"), ("ConnectTiming", "i32"),
    ("ResponseStartTiming", "i32"), ("ResponseEndTiming", "i32"),
    ("FetchTiming", "i32"), ("SocialSourceNetworkID", "i16"),
    ("SocialSourcePage", "str"), ("ParamPrice", "i64"),
    ("ParamOrderID", "str"), ("ParamCurrency", "str"),
    ("ParamCurrencyID", "i16"), ("OpenstatServiceName", "str"),
    ("OpenstatCampaignID", "str"), ("OpenstatAdID", "str"),
    ("OpenstatSourceID", "str"), ("UTMSource", "str"), ("UTMMedium", "str"),
    ("UTMCampaign", "str"), ("UTMContent", "str"), ("UTMTerm", "str"),
    ("FromTag", "str"), ("HasGCLID", "i16"), ("RefererHash", "i64"),
    ("URLHash", "i64"), ("CLID", "i32"),
]

_DAY = 15901          # 2013-07-15 as days since epoch (q06)
_T0 = _DAY * 86400    # midnight UTC


def _mk_row(**kw) -> dict:
    """Sparse row: unset columns take _arrow_table's defaults ('' / 0,
    EventDate = 2013-07-15, CounterID = 1 — never 62, so q36-q42 stay
    empty). Both suites' builders share this representation."""
    return dict(kw)


def _shash(s: str) -> int:
    """Deterministic tiny string hash (builtin hash() is salted)."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 997
    return h


# ---------------------------------------------------------------------------
# single-suite plan data (all literals from slt/clickbench/single/*.slt)
# ---------------------------------------------------------------------------

P1 = "ведомосквы вместу"
P2 = "ведомосквиталия страции"
P3 = "ведомосквы вы из"
P4 = "ведомосковский"
P5 = "ведомоскве варфейс"
P6 = "растика конд каторией в чебурек"
P7 = "авторий"
P8 = "коптимиквиды юристический"
P9 = "ведомосква"
P10 = "ведомосквы с ляйсан баллы"
PN1 = "шарарки в москве"        # q24 early pair
PN2 = "ведомосква мартыне"      # q24 early pair
X1 = "покеты рецепт засня"                  # q13 u=3
X2 = "usb на алекомедит джонс мультр"       # q13 u=2
X3 = "активный отельство"                   # q13 u=2
X4 = "афиша липецк автосточка"              # q13 u=2
F13 = "чебуречный спрос"        # filler phrase for the SE=13 ip group
S1P = "авомосква веб каменисный"
S2P = "чагин выпуска на волна 2 сезон 24 резюме онлайн"
S3P = "my loving teknos 200885;&#1091;&"
S4P = "авомосковью и тедения пробегом и запечение"
S6P = "коптимир крас возрождения креставки"
S7P = "ай ку"
Q25_PHRASES = [     # q25: the 5 smallest phrases, exactly 2 rows, 1 user each
    "188242-81 кубов",
    "5951-88 денске-уральские массы велир",
    "95 квартир",
    "diamond rmc m45011-8 сериал",
    "erection пермь курском звучка штильники скривода моряков адлера",
]

Q22_URL = "https://produkty%2Fpulove.ru/booklyattion-war-sinij-9182/women"
Q22_TITLE = (
    "Легко на участные участников., Цены - Стильная парнем. Саганрог "
    "догадения : Турции, купить у 10 дне кольные машинки не представки - "
    "Новая с избиение спродажа: котята 2014 г.в. Цена: 47500-10ECO060 – "
    "-------- купить квартиру Оренбург (России Galantrax Flamiliada "
    "Google, Nо 18 фотоконверк Супер Кардиган"
)

# q33 URL histogram (counts pinned; 42 chosen for the unshown 11th so q33's
# in-order compare has no tie at 43)
URL_PLAN = [
    ("https://produkty%2Fproduct", 225),
    ("https://produkty%2Fpulove.ru/album/login", 140),
    ("", 130),
    ("https://produkty%2Fpulove.ru/kiroverlanet.ru/otdam-soul", 118),
    ("https://produkty/kurortmag", 108),
    ("https://produkty%2F", 102),
    ("https://produkty%2Fpulove.ru/kiroverlanet.ru/otdam-soulmjj/628965/"
     "detail.aspx?Forum.cofe.ru&pvid=163789569-geniya_1538", 62),
    ("https://produkty/full&qset=159508&s_yers", 60),
    ("https://produkty%2Fproduct_id", 50),
    ("https://produkty%2Fpulove.ru/moscow", 43),
    ("https://produkty%2Fpulove.ru/novosib", 42),
]

# q08/q09 region plan: region → (rows, adv_sum, rw_avg, distinct_users)
REGIONS = {
    229: (5197, 1156, 1641.5397344621897, 294),
    2: (1964, 326, 1561.1390020366598, 119),
    1: (623, 60, 1617.720706260032, 38),
    208: (213, 102, 1172.906103286385, 29),
    7: (164, 16, 1592.5853658536585, 12),
    12457: (142, 130, 1777.1549295774648, 2),
    9: (98, 0, 1559.2857142857142, 9),
    47: (96, 8, 1174.75, 6),
    57: (78, 20, 1603.3846153846155, 5),
    34: (76, 18, 1578.1052631578948, 6),
}
# q08-only regions: (rows chosen ≤75, pinned distinct_users)
Q08_REGIONS = {11: (60, 8), 139: (55, 8), 226: (50, 8), 14593: (40, 7)}

TOTAL_ROWS = 10_000
TOTAL_USERS = 723       # q04
TOTAL_PHRASES = 390     # q05 (includes '')
RW_SUM = 15_922_380     # q02/q29
AVG_USER = -7.135061942656019e18  # q03
ADV_PLAN = {2: 220, 13: 142}      # q01/q07
# per-region AdvEngineID decomposition: region → (#rows of 2, #rows of 13);
# satisfies 2a+13b == REGIONS[r][1] and Σa=220, Σb=142 with the remainder
# (a=160, b=10 → sum 450) spread over non-q09 regions
ADV_REGION = {229: (6, 88), 2: (7, 24), 1: (4, 4), 208: (12, 6),
              7: (8, 0), 12457: (0, 10), 9: (0, 0), 47: (4, 0),
              57: (10, 0), 34: (9, 0)}
ADV_OTHER = (160, 10)

# q17: the largest of the seven pinned-smallest UserIDs — the steered
# pad uids must stay strictly above it (uid_floor)
Q17_MAX_SMALLEST = -9178515231912571900

# q31: ten smallest WatchIDs among SearchPhrase<>'' rows
W_SMALL = [
    (4617561261186506426, 1785570738, 0, 1750),
    (4621548433098056642, 1515936442, 1, 1917),
    (4627214020331320067, 743072690, 1, 1368),    # U1 row
    (4630380122233063518, 1207096081, 1, 1917),
    (4636835208715655538, 1603657374, 0, 1828),
    (4638023078767590803, 601553448, 0, 1368),
    (4640697035997705957, 743072690, 0, 1368),    # U1 row
    (4646520385515517960, 1337491165, 0, 1368),
    (4647310520206361580, 127765921, 0, 1638),
    (4649178432418992904, 1948294990, 0, 1750),
]
# q32: ten largest WatchIDs overall
W_BIG = [
    (9223293557789499343, 1743521871, 1, 1760),
    (9223247512111991176, 1745080255, 0, 1917),
    (9223117509516371378, -2134099372, 0, 1638),
    (9222583454246564335, 1499579807, 0, 1750),
    (9222423940302739840, 1943715871, 0, 1638),   # U7 ('' row)
    (9222148957862209006, 2087176462, 1, 1368),
    (9220326222135566870, 934770972, 0, 1087),    # U6 ('' row)
    (9220253031120917191, -504725664, 0, 1638),
    (9219819009086900760, 2052076231, 0, 1891),
    (9218696198217409492, -673500741, 1, 1638),   # SE13 group row
]


class _User:
    __slots__ = ("uid", "ip", "groups", "empty", "minute_pins", "region",
                 "is_pad")

    def __init__(self, uid, ip=None, empty=0, is_pad=False):
        self.uid = uid
        self.ip = ip
        self.groups = []        # (phrase, se, count, rw_or_None, refresh_n)
        self.empty = empty
        self.minute_pins = {}   # minute → count, for '' rows (q18)
        self.region = None
        self.is_pad = is_pad

    @property
    def total(self):
        return self.empty + sum(g[2] for g in self.groups)


def _build_single_users() -> tuple[list[_User], list[_User]]:
    """Returns (all_users, pads)."""
    users: list[_User] = []

    def mk(uid, ip=None, empty=0):
        u = _User(uid, ip, empty)
        users.append(u)
        return u

    # --- q17: the seven smallest UserIDs, group sets pinned exactly
    s1 = mk(-9214751021948998350); s1.groups.append((S1P, 4, 2, None, 0))
    s2 = mk(-9213728704863893851, empty=2)
    s2.groups.append((S2P, 4, 2, None, 0))
    s3 = mk(-9185786869851590940); s3.groups.append((S3P, 4, 2, None, 0))
    s4 = mk(-9183768020535680440); s4.groups.append((S4P, 4, 2, None, 0))
    s5 = mk(-9181512033394222426); s5.groups.append((P4, 2, 2, None, 0))
    s6 = mk(-9180825132631298460, empty=18)
    s6.groups.append((S6P, 4, 2, None, 0))
    s7 = mk(Q17_MAX_SMALLEST, empty=26)
    s7.groups.append((S7P, 4, 2, None, 0))

    # --- q15/q16 top users (totals & '' counts pinned), IPs from q35,
    #     non-empty (se,ip) groups from q30
    u1 = mk(-7918574344944952583, 743072690, empty=182)
    u1.minute_pins = {26: 24, 9: 14}
    u2 = mk(-7589677728426322164, -896338100, empty=152)
    u3 = mk(-8258406745529374862, 1735595921, empty=111)
    mk(-8906290752198210953, 2107723744, empty=126)                  # U4
    u5 = mk(-7904263253391067902, 1852934819, empty=123)
    u5.minute_pins = {34: 14}
    mk(-8351596774216514728, 934770972, empty=112)                   # U6
    u7 = mk(-5813304333699498523, 1943715871, empty=102)
    u8 = mk(-6263574068676474198, 1140309473, empty=98)
    mk(-5808690843284415970, 1593446890, empty=104)                  # U9
    u10 = mk(-7443496593543088467, 874640340, empty=100)
    mk(-4975559395456095104, 999999999, empty=102)                   # U11
    mk(-8229872269465361314, 1010101010, empty=100)                  # U12
    # q18 pinned-minute users
    u13 = mk(-9154375582268094750, empty=20); u13.minute_pins = {1: 20}
    u14 = mk(-8455721461950319637, empty=16); u14.minute_pins = {21: 16}
    u15 = mk(-8284294157038592779, empty=16); u15.minute_pins = {11: 16}
    u16 = mk(-7725127544842036118, empty=16); u16.minute_pins = {21: 16}
    u17 = mk(-9158995094684353950, empty=14); u17.minute_pins = {12: 14}
    u18 = mk(-7018910098174567459, empty=28)
    u18.minute_pins = {56: 14, 57: 14}

    nid = [5_000_000_000_000]   # small positive uid sequence

    def small(ip=None, empty=0):
        nid[0] += 1
        return mk(nid[0], ip, empty)

    # --- q30 pinned (SearchEngineID, ClientIP) groups not owned by U-users
    v1 = small(-125068408)      # (2,-125068408,14,r7,1638)
    v2 = small(-1555581670)     # (2,-1555581670,12,r6,1638)
    v3 = small(-1300828471)     # (2,-1300828471,10,r5,1396)
    v4 = small(-181568119)      # (2,-181568119,10,r5,1996)
    v5 = small(403806690)       # (2,403806690,10,r5,1828)
    v6 = small(1449805590)      # (2,1449805590,10,r6,1638)

    # big-consumer phrase allocation (hand-balanced; asserted in build):
    # (user, phrase, se, count, rw, refresh)
    big_alloc = [
        (v1, P5, 2, 14, 1638, 7),
        (v2, P5, 2, 6, 1638, 3), (v2, P8, 2, 6, 1638, 3),
        (u1, P10, 2, 6, 1368, 3), (u1, P7, 2, 4, 1368, 2),
        (u1, P3, 2, 2, 1368, 1),                 # + w3's refresh → 6 (q30)
        (u2, P7, 2, 2, None, 0), (u2, P3, 2, 2, None, 0),
        (u3, P10, 2, 6, 1638, 3), (u3, P9, 2, 5, 1638, 2),
        (u3, P4, 2, 9, 1638, 4),
        (u7, P7, 2, 2, None, 0), (u7, P3, 2, 4, None, 0),
        (u7, P4, 2, 4, None, 0),
        (u8, P8, 2, 8, 1638, 4), (u8, P2, 2, 4, 1638, 2),
        (u10, P9, 2, 2, None, 0),
        (v3, P9, 2, 4, 1396, 2), (v3, P3, 2, 6, 1396, 3),
        (v4, P9, 2, 2, 1996, 1), (v4, P7, 2, 4, 1996, 2),
        (v4, P3, 2, 4, 1996, 2),
        (v5, P7, 2, 2, 1828, 1), (v5, P4, 2, 8, 1828, 4),
        (v6, P4, 2, 6, 1638, 4), (v6, P3, 2, 4, 1638, 2),
    ]
    for u, p, se, n, rw, rf in big_alloc:
        u.groups.append((p, se, n, rw, rf))

    # --- SE=13 ip group (q30: (13,-673500741) c=20, refresh 12, rw 1638)
    p6a = small(-673500741); p6a.groups.append((P6, 13, 8, 1638, 5))
    p6b = small(-673500741); p6b.groups.append((P6, 13, 8, 1638, 5))
    p6c = small(-673500741); p6c.groups.append((F13, 13, 4, 1638, 2))

    # --- small users completing each phrase's row count & distinct-user
    #     target (q12/q13/q14)
    def spread(total, n_users):
        base, rem = divmod(total, n_users)
        return [base + (1 if i < rem else 0) for i in range(n_users)]

    p1_smalls = []
    for c in spread(87, 20):
        u = small(); u.groups.append((P1, 2, c, None, 0)); p1_smalls.append(u)
    for c in spread(15, 6):
        u = small(); u.groups.append((P1, 3, c, None, 0)); p1_smalls.append(u)
    for c in spread(8, 6):
        u = small(); u.groups.append((P1, 5, c, None, 0)); p1_smalls.append(u)
    # the eight q31-pinned WatchID rows not owned by U1 ride on P1 smalls:
    # give those users the pinned ClientIPs
    w_ips = [ip for _, ip, _, _ in W_SMALL if ip != 743072690]
    for u, ip in zip(p1_smalls, w_ips):
        u.ip = ip
    for c in spread(35, 11):
        u = small(); u.groups.append((P2, 2, c, None, 0))
    for c in spread(6, 3):
        u = small(); u.groups.append((P2, 5, c, None, 0))
    for c in spread(9, 2):
        u = small(); u.groups.append((P3, 2, c, None, 0))
    for c in spread(7, 2):
        u = small(); u.groups.append((P3, 5, c, None, 0))
    for _ in range(4):
        u = small(); u.groups.append((P4, 2, 1, None, 0))

    # q13 low-u phrases and q25's five pinned-smallest phrases
    for _ in range(3):
        u = small(); u.groups.append((X1, 4, 1, None, 0))
    for ph in (X2, X3, X4):
        for _ in range(2):
            u = small(); u.groups.append((ph, 4, 1, None, 0))
    for ph in Q25_PHRASES + [PN1, PN2]:
        u = small(); u.groups.append((ph, 4, 2, None, 0))

    # --- filler phrases to reach exactly 390 distinct values (incl. '')
    fixed_phrases = {
        P1, P2, P3, P4, P5, P6, P7, P8, P9, P10, PN1, PN2, S1P, S2P, S3P,
        S4P, S6P, S7P, X1, X2, X3, X4, F13, *Q25_PHRASES, "",
    }
    for i in range(TOTAL_PHRASES - len(fixed_phrases)):
        u = small()
        u.groups.append((f"тема {i:03d} простое разное", 4, 1, None, 0))

    # --- pad users: '' rows only; region assignment sizes them
    n_pads = TOTAL_USERS - len(users)
    pad_rows = TOTAL_ROWS - sum(u.total for u in users)
    assert n_pads > 40 and pad_rows >= n_pads, (n_pads, pad_rows)
    pads = []
    # q32 pinned '' rows not owned by U6/U7/the SE13 group → dedicated pads
    w_pad_ips = [ip for _, ip, _, _ in W_BIG
                 if ip not in (1943715871, 934770972, -673500741)]
    for ip in w_pad_ips:
        p = mk(0, ip, empty=1)
        p.is_pad = True
        pads.append(p)
    for _ in range(n_pads - len(w_pad_ips)):
        p = mk(0, None, empty=1)
        p.is_pad = True
        pads.append(p)
    return users, pads


def _build_single_rows() -> list[dict]:
    users, pads = _build_single_users()
    specs = [(r, c, uq) for r, (c, _a, _w, uq) in REGIONS.items()]
    specs += [(r, cu[0], cu[1]) for r, cu in Q08_REGIONS.items()]
    _assign_regions_generic(
        users, pads, specs, total_rows=TOTAL_ROWS,
        other_user_cap=7, other_row_cap=75, pad_row_cap=99,
        other_rid_base=20_001,
    )
    # uid floor: pads must never usurp q17's pinned smallest users
    _steer_user_ids_generic(users, pads, AVG_USER, TOTAL_ROWS, TOTAL_USERS,
                            uid_floor=Q17_MAX_SMALLEST)

    # unique IPs for everyone unassigned
    seen_ips = {u.ip for u in users if u.ip is not None}
    nxt = 100_000
    for u in users:
        if u.ip is None:
            while nxt in seen_ips:
                nxt += 1
            u.ip = nxt
            seen_ips.add(nxt)

    rows: list[dict] = []
    w_small_left = {}
    for t in W_SMALL:
        w_small_left.setdefault(t[1], []).append(t)
    w_big_left = {}
    for t in W_BIG:
        w_big_left.setdefault(t[1], []).append(t)
    next_ne = [4_650_000_000_000_000_000]   # non-empty WatchID sequence
    next_e = [6_000_000_000_000_000_000]    # ''-row WatchID sequence

    # q24/q26: the ten earliest EventTimes among SearchPhrase<>'' rows,
    # in this exact output order (pairs share a phrase)
    early_order = [P10, P10, P4, P4, PN1, PN1, P1, P1, PN2, PN2]
    early_idx = {}
    for i, ph in enumerate(early_order):
        early_idx.setdefault(ph, []).append(i)
    # owner of the early pair for multi-user phrases (any user works;
    # pinned here so exactly one user's rows claim them)
    p1_first_small = next(u for u in users
                          if u.groups and u.groups[0][0] == P1)
    u1 = next(u for u in users if u.uid == -7918574344944952583)
    s5 = next(u for u in users if u.uid == -9181512033394222426)
    early_owner = {P10: u1.uid, P4: s5.uid, P1: p1_first_small.uid}

    hour_cycle = [0]

    def ev_time(minute):
        hour_cycle[0] = hour_cycle[0] % 22 + 1   # hours 1..22
        return _T0 + hour_cycle[0] * 3600 + minute * 60 + len(rows) % 60

    for u in users:
        for phrase, se, n, rw, refresh_n in u.groups:
            made_refresh = 0
            claims_early = (phrase in early_idx
                            and early_owner.get(phrase, u.uid) == u.uid)
            for k in range(n):
                r = _mk_row(UserID=u.uid, ClientIP=u.ip, RegionID=u.region,
                            SearchPhrase=phrase, SearchEngineID=se)
                if claims_early and early_idx[phrase]:
                    r["EventTime"] = _T0 + early_idx[phrase].pop(0)
                else:
                    r["EventTime"] = ev_time((k // 12 * 7 + _shash(phrase))
                                             % 60)
                pin = w_small_left.get(u.ip)
                if not pin and phrase == F13:
                    pin = w_big_left.get(u.ip)
                if pin:
                    wid, _ip, rf, prw = pin.pop(0)
                    r["WatchID"] = wid
                    r["IsRefresh"] = rf
                    r["ResolutionWidth"] = prw
                    r["__rw_pinned"] = True
                    made_refresh += rf
                else:
                    next_ne[0] += 1
                    r["WatchID"] = next_ne[0]
                    if made_refresh < refresh_n:
                        r["IsRefresh"] = 1
                        made_refresh += 1
                    if rw is not None:
                        r["ResolutionWidth"] = rw
                        r["__rw_pinned"] = True
                rows.append(r)
        # '' rows with the q18 minute plan (≤12 per unpinned minute)
        minutes = []
        for m, cnt in sorted(u.minute_pins.items()):
            minutes += [m] * cnt
        allowed = [m for m in range(60) if m not in u.minute_pins]
        k = 0
        base = abs(u.uid) % len(allowed)
        while len(minutes) < u.empty:
            minutes.append(allowed[(base + k // 12) % len(allowed)])
            k += 1
        for m in minutes:
            r = _mk_row(UserID=u.uid, ClientIP=u.ip, RegionID=u.region,
                        EventTime=ev_time(m))
            pin = w_big_left.get(u.ip)
            if pin:
                wid, _ip, rf, prw = pin.pop(0)
                r["WatchID"] = wid
                r["IsRefresh"] = rf
                r["ResolutionWidth"] = prw
                r["__rw_pinned"] = True
            else:
                next_e[0] += 1
                r["WatchID"] = next_e[0]
            rows.append(r)

    assert len(rows) == TOTAL_ROWS, len(rows)
    assert not any(w_small_left.values()), w_small_left
    assert not any(w_big_left.values()), w_big_left

    # --- AdvEngineID placement (q01/q02/q07/q09)
    by_region: dict[int, list[dict]] = {}
    for r in rows:
        by_region.setdefault(r["RegionID"], []).append(r)
    placed = {2: 0, 13: 0}
    for reg, (a, b) in ADV_REGION.items():
        cand = by_region[reg]
        assert len(cand) >= a + b, (reg, a, b)
        for r in cand[:a]:
            r["AdvEngineID"] = 2
        for r in cand[a:a + b]:
            r["AdvEngineID"] = 13
        placed[2] += a
        placed[13] += b
    other_pool = [r for reg, rl in by_region.items()
                  if reg not in ADV_REGION for r in rl]
    a, b = ADV_OTHER
    for r in other_pool[:a]:
        r["AdvEngineID"] = 2
    for r in other_pool[a:a + b]:
        r["AdvEngineID"] = 13
    placed[2] += a
    placed[13] += b
    assert placed == ADV_PLAN, placed

    # --- ResolutionWidth balancing to the per-region averages (q09) and
    #     the global sum (q02/q29)
    targets = {reg: round(avg * c)
               for reg, (c, _a2, avg, _u2) in REGIONS.items()}
    assert all(abs(targets[g] - REGIONS[g][2] * REGIONS[g][0]) < 0.51
               for g in REGIONS)
    other_regs = [g for g in by_region if g not in targets]
    leftover = RW_SUM - sum(targets.values())
    other_total = sum(len(by_region[g]) for g in other_regs)
    for g in other_regs:
        targets[g] = leftover * len(by_region[g]) // other_total
    for g, rl in by_region.items():
        free = [r for r in rl if not r.get("__rw_pinned")]
        pinned_sum = sum(r["ResolutionWidth"] for r in rl
                         if r.get("__rw_pinned"))
        want = targets[g] - pinned_sum
        assert free, f"region {g} has no free rows for RW balance"
        base, rem = divmod(want, len(free))
        assert 0 <= base <= 32_000, (g, base)
        for i, r in enumerate(free):
            r["ResolutionWidth"] = base + (1 if i < rem else 0)
    # integer-division crumbs land on one row of a NON-q09 region (their
    # per-region sums are unconstrained)
    crumbs = RW_SUM - sum(r["ResolutionWidth"] for r in rows)
    fixer = next(r for r in by_region[other_regs[0]]
                 if not r.get("__rw_pinned"))
    fixer["ResolutionWidth"] += crumbs
    assert 0 <= fixer["ResolutionWidth"] <= 32_767
    assert sum(r["ResolutionWidth"] for r in rows) == RW_SUM

    # --- URLs (q33/q34) + the q22 special row
    url_seq: list[str] = []
    for url, cnt in URL_PLAN:
        url_seq += [url] * cnt
    filler = TOTAL_ROWS - len(url_seq) - 1      # −1: the q22 row
    fi = 0
    while filler > 0:
        take = min(30, filler)
        url_seq += [f"https://produkty/f{fi:04d}"] * take
        filler -= take
        fi += 1
    q22_done = False
    ui = 0
    for r in rows:
        if not q22_done and r.get("SearchPhrase") == P2:
            r["URL"] = Q22_URL
            r["Title"] = Q22_TITLE
            q22_done = True
            continue
        r["URL"] = url_seq[ui]
        ui += 1
    assert q22_done and ui == len(url_seq)

    # --- MobilePhoneModel (q10/q11): 22 distinct users over 4 phone codes
    first_row_of: dict[int, dict] = {}
    for r in rows:
        first_row_of.setdefault(r["UserID"], r)
    picked = iter(pads)
    for phone, n_users in [(1, 19), (19, 1), (60, 1), (7, 1)]:
        for _ in range(n_users):
            u = next(picked)
            fr = first_row_of[u.uid]
            fr["MobilePhone"] = phone
            fr["MobilePhoneModel"] = "iPad"

    for r in rows:
        r.pop("__rw_pinned", None)
        r["ClientEventTime"] = r["EventTime"]
        r["LocalEventTime"] = r["EventTime"]
    # cheap global invariants (full verification is the DuckDB/SLT gate)
    assert len({r["WatchID"] for r in rows}) == TOTAL_ROWS
    assert len({r.get("SearchPhrase", "") for r in rows}) == TOTAL_PHRASES
    assert len({r["UserID"] for r in rows}) == TOTAL_USERS
    return rows


def _arrow_table(rows: list[dict], binary_strings: bool):
    import pyarrow as pa

    defaults = {n: ("" if k == "str" else 0) for n, k in SCHEMA}
    defaults["EventDate"] = _DAY
    defaults["CounterID"] = 1
    arrays, fields = [], []
    for name, kind in SCHEMA:
        dflt = defaults[name]
        vals = [r.get(name, dflt) for r in rows]
        if kind == "i16":
            t = pa.int16()
        elif kind == "i32":
            t = pa.int32()
        elif kind == "i64":
            t = pa.int64()
        elif kind == "date16":
            t = pa.uint16()
        else:
            t = pa.binary() if binary_strings else pa.string()
            if binary_strings:
                vals = [v.encode() for v in vals]
        arrays.append(pa.array(vals, type=t))
        fields.append(pa.field(name, t))
    return pa.table(dict(zip([f.name for f in fields], arrays)),
                    schema=pa.schema(fields))


# ===========================================================================
# partitioned-suite plan (slt/clickbench/partitioned/*.slt — a DIFFERENT,
# 100 000-row truncation with its own goldens)
# ===========================================================================

PT_TOTAL = 100_000
PT_USERS = 19_804      # q04
PT_PHRASES = 8_124     # q05 (includes '')
PT_RW_SUM = 151_496_936               # q02/q29
PT_AVG_USER = 1.790912656247254e18    # q03
PT_ADV = {2: 337, 45: 117, 13: 61, 3: 7, 27: 3, 52: 2, 50: 1}  # q07

# q12 counts / q13 distinct users / q14 per-SE splits, as one table:
# phrase → ({se: rows}, u_target)
PT_PHRASE_PLAN = {
    "карелки": ({2: 54, 3: 46, 4: 30, 5: 9}, 39),
    "албатрутдин": ({2: 20, 3: 33, 5: 7}, 29),
    "самарестская прессии. крыловые": ({3: 31}, 8),
    "смотреть онлайн": ({2: 20, 5: 11}, 24),
    "дружке помещение": ({2: 28, 5: 1}, 13),
    "футажирской": ({2: 13, 3: 12}, 6),
    "смотреть": ({2: 18, 5: 5}, 19),
    "смотреть онлайн бесплатно": ({2: 12, 3: 10}, 21),
    "секс старый от": ({2: 19}, 5),
    "сколько мытищи": ({2: 10, 5: 9}, 13),
    "экзоидные": ({2: 14}, 14),
    "коды я телефон": ({2: 13}, 13),
    "игратьяна маша и обращения": ({2: 12}, 12),
}

# q09: region → (rows, adv_sum, rw_avg, distinct_users)
PT_REGIONS = {
    229: (19879, 4096, 1539.5330248000403, 3729),
    2: (8095, 159, 1468.4835083384805, 1347),
    208: (3746, 229, 1190.1388147357181, 830),
    169: (2861, 20, 1422.2492135616917, 578),
    107: (2770, 89, 1096.1649819494585, 597),
    34: (2220, 367, 1622.3207207207208, 340),
    32: (1845, 84, 1552.4124661246613, 240),
    42: (1525, 4, 1599.6190163934427, 272),
    44: (1361, 42, 1260.5326965466568, 227),
    106: (1325, 12, 1688.6354716981132, 153),
}
# q08-only regions (u pinned; rows chosen below the q09 cutoff of 1325)
PT_Q08_REGIONS = {184: (1200, 298), 1: (1150, 285), 158: (1100, 264)}

# per-region AdvEngineID decomposition (value → row count); satisfies
# Σ v·n == region adv_sum and column-wise totals ≤ PT_ADV, the remainder
# spread over non-q09 regions
PT_ADV_REGION = {
    229: {45: 88, 2: 68},
    2: {45: 1, 13: 2, 2: 44},
    208: {45: 4, 13: 1, 2: 18},
    169: {2: 10},
    107: {45: 1, 2: 22},
    34: {45: 7, 2: 26},
    32: {13: 2, 2: 29},
    42: {2: 2},
    44: {13: 2, 2: 8},
    106: {2: 6},
}

# q15/q16/q35: (uid, total_rows, empty_rows, client_ip)
PT_TOP_USERS = [
    (41807706700062380, 755, 754, 2087340455),
    (1562640662116092494, 514, 510, -1157627977),
    (837030437662161096, 367, 367, -1053709350),
    (2269436933544637193, 366, 366, 1379989994),
    (7784313027574572611, 348, 348, 1093422790),
    (1746707412719239174, 335, 335, -1136831848),
    (30308260369410819, 306, 306, 1700490537),
    (3222472366988226278, 302, 302, -504823980),
    (42054270512169853, 297, 297, -1831087278),
    (692173635739341594, 295, 295, 1984071770),
]
# q18 minute pins: uid → {minute: count}
PT_MINUTE_PINS = {
    41807706700062380: {0: 39, 24: 32, 8: 31, 58: 29},
    7784313027574572611: {11: 29, 12: 27},
    1746707412719239174: {23: 29},
}
# q18 extra pinned-minute users: (uid, empty_rows, {minute: count})
PT_MINUTE_USERS = [
    (314262872525830524, 63, {6: 63}),
    (1747185559404332185, 29, {32: 29}),
    (1751766049836573147, 28, {49: 28}),
]

# q17: the seven smallest UserIDs — (uid, empty, [(phrase, rows)])
PT_SMALLEST = [
    (-9220868456983495476, 7, []),
    (-9214751021948998350, 0, [("авомосква веб каменисный", 2)]),
    (-9213728704863893851, 2,
     [("чагин выпуска на волна 2 сезон 24 резюме онлайн", 2)]),
    (-9211766507324270896, 1,
     [("неровой мультик муравьен мазь вирт", 1)]),
    (-9187932620519482331, 8, [("вспомидорковье лодов", 1)]),
    (-9185786869851590940, 0, [("my loving teknos 200885;&#1091;&", 2)]),
    (-9184253468857993081, 7, []),
]

# q30: (se, client_ip, rows, refresh_sum, rw)
PT_Q30 = [
    (3, -1034800790, 31, 8, 1750),
    (2, 1783543165, 28, 0, 1368),
    (2, 1417975104, 19, 0, 1368),
    (2, 1846255786, 17, 1, 1368),
    (2, 1524051586, 15, 4, 1638),
    (3, 1646986298, 15, 0, 1638),
    (2, 1966393542, 14, 0, 1368),
    (2, -1598586988, 13, 0, 1990),
    (4, 317128473, 13, 2, 1996),
    (2, -482883409, 12, 0, 1996),
]

# q31: ten smallest WatchIDs among SearchPhrase<>'' rows
PT_W_SMALL = [
    (4612370633242225390, -1942588412, 0, 1917),
    (4612570075531272731, 2038702050, 0, 1087),
    (4612932267616621082, 1559515331, 0, 1250),
    (4614288805349139728, 833220039, 0, 1503),
    (4614904794321388368, 1336397430, 0, 1368),
    (4615657597981734919, -208854013, 0, 1697),
    (4615704411839892664, 1549242453, 0, 1638),
    (4615785498062991578, -603595433, 0, 1750),
    (4616012623521387671, -856905447, 0, 253),
    (4616727492768065163, 938377770, 0, 1368),
]
# q32: ten largest WatchIDs overall (all on '' rows here)
PT_W_BIG = [
    (9223346073397044919, 1486596066, 0, 582),
    (9223289112528719433, 1574814697, 0, 1638),
    (9223219972965907103, 1177840395, 0, 1638),
    (9223117772270931170, 623938913, 0, 1990),
    (9223117509516371378, -2134099372, 0, 1638),
    (9223099810030938582, 1672965941, 0, 582),
    (9223070351560418166, -158811327, 0, 1917),
    (9222950988647893041, 1176213215, 0, 1638),
    (9222871663945957981, 1365652814, 0, 1638),
    (9222844614246726949, -472300100, 0, 1638),
]

# q33/q34 URL histogram (all other URLs ≤ 438)
PT_URL_PLAN = [
    ("http://liver.ru/belgorod/page/1006.jки/доп_приборы", 3808),
    ("http://video.yandex", 1342),
    ("http://kinopoisk.ru", 1133),
    ("http://auto_fiat_dlya-bluzki%2F8536.30.18&he=900&with", 1000),
    ("http://bdsm_po_yers=0&with_video", 825),
    ("http://sp-money.yandex.ru/comme%2F27.0.1453.116 Safari", 586),
    ("http://video.yandex.ru%26sid", 523),
    ("http://bjdleaks.php?produkty%2Fproduct", 513),
    ("http://liver.ru/place_rukodel=365115eb7bbb90", 463),
    ("http://smeshariki.ru/?id=6", 439),
]

# q36 (CounterID=62 & DontCountHits=0 & IsRefresh=0 & URL<>'')
PT_C62_URLS = [
    ("http://irr.ru/index.php?showalbum/login-leniya7777294,938303130", 64),
    ("http://irr.ru/index.php?showalbum/login-kapustic/product_name", 59),
    ("http://komme%2F27.0.1453.116", 45),
    ("http://irr.ru/index.php?showalbum/login-kapusta-advert2668]=0"
     "&order_by=0", 9),
    ("http://irr.ru/index.php?showalbum/login-kupalnik", 9),
    ("http://irr.ru/index.php?showalbum/login-kapusta-advert27256"
     ".html_params", 8),
    ("http://irr.ru/index.php?showalbum/login.pl?cmd=showbiz/photo-7/"
     "#photo=6", 8),
    ("http://irr.ru/index.php?showalbum/login-kapustom%3D%26xpid%3D158197"
     "%26width%3D728%26height", 7),
    ("http://irr.ru/index.php?showalbum/list=0&vip=&int[22970][to]="
     "&input_who2=1&isize%3D0%26ad%3D27888885%26bt%3D43%26bn%3DKeyword"
     "&ti=Толстуху если mastered/main.aspx?naId=6oBCPopQZUU&where=all"
     "&text=офис хилз 90216629", 5),
    ("http://irr.ru/index.php?showalbum/login-kapusta-advert2486"
     ".html&services", 5),
]
# q37 (same filter, Title<>'')
PT_C62_TITLES = [
    ("Брюки New Era H (Асус) 258 общая выплаток, горшечными", 140),
    ("Приморск - IRR.ru", 75),
    ("Тест (Россия) - Яндекс", 74),
    ("Теплоску на", 62),
    ("Шарарай), Выбрать! - обсуждаются на голд: Шоубиз - Свободная "
     "историс", 52),
    ("Приморск (Россия) - Яндекс.Видео", 41),
    ("бассе» — Афиша@Mail.Ru / Новости из рук в Москва (Россия) - форум",
     36),
    ("бассе» в персональные гонки цветы", 26),
    ("Бесплатные щенки | SexWife: Женщинам соусе сериаловарях — Яндекс",
     24),
    ("AUTO.ria.ua ™ - Аппер", 23),
]

# q21: exactly one URL-contains-'google' row has a SearchPhrase
PT_Q21 = (
    "производств оставая вакаро новых богатыря у детский",
    "http://smeshariki.ru/index.ua/product_id=0&page9/#overkh%2F%2F"
    "wwwwww.bonprix.ru/mepps.google-Android 4.0.1453.95 Safari%2F5.0 "
    "(Windows)&bL=ru&cE=true&uA=Mozilla%2F%2Fwwwww.bonprix.ru%2F"
    "product_id=16921150?blocks.html?personal/unsRcoxmoi/semiranimals/"
    "clothes",
)
PT_GOOGLE_EMPTY = 42      # the remaining URL-'google' rows ('' phrase)

# q22: the five Title-contains-'Google' rows (phrase, url, title)
PT_Q22 = [
    ("авторы для заданным и операта",
     "http%3A//unise.ru/carspringtau_trafkey=964113",
     "Google Papa Rapalaxy Accer Travel.Ru — перименте - Пульс цене – "
     "Яндекс.Слова"),
    ("прогноз посад люберцах дома стробережье курорт чечная сель "
     "смотреть онлайн",
     "http:%2F%2Fvk.com/iframe/iframe-owa.html_parapleservices/"
     "483850.html?Messa",
     "SEMIR GEA Gamo — пробегом мошения, Спортал Мире Ламины в большой "
     "брита Google, аксессуары"),
    ("игры для дер блич",
     "http://kinopoisk.ru/a-albums_scroll_to_auto_id=363064472354"
     "&lb_id=1559843",
     "Легко на купить автозаврам телась Google Anaissage_599-61 "
     "«Оверлок колепный рецепт: Тверсал, 20008 г.в. Цена: 300 с "
     "пробегом и новый магазине Wildberries.ru (Работа"),
    ("вспоминский языке 400 отзывы майнкрафт",
     "http://pogoda.yandex.ru/cgi-bin/click.cgi%3Fsid%3D10394,911894"
     "&op_provideo.yandex",
     "Чуваши условары к Samsung Galaxy S4 Google And "
     "Benrolf-autodoc.ru/viewsAndroid — Продам - Челябинск, Кирования. "
     "Коммерческая одежда, г. Санкт-Петербурге"),
    ("wwwwww.komplex hepburn manhattalibraheat",
     "http://xx-bikin.ru/catalog/SHHitovyj-97542.xhtml#newsru.com/ru/"
     "auto_id=2479&offe.30533&site_off=FORID:9&ie=wizbiz",
     "«factoria Google — Selena, 32, Москва предмет:Перов - "
     "loveplanet.ru. Не огромный медалии, Египертов в Через - Свободная "
     "блузки"),
]

# q24/q26: the ten earliest EventTimes among SearchPhrase<>'' rows —
# (phrase, rows_for_that_phrase); output order is row-per-entry below
PT_EARLY_ORDER = [
    "погода сотряд",
    "русскных блюдей по нечас",
    "мультики видео такое чистирли",
    "мультики видео такое чистирли",
    "мультики видео такое чистирли",
    "белгория",
    "far crysis 38 сезон смотреть",
    "санатор тверь русская до машины в хорошем",
    "цены 2013 круизервался по мошение",
    "санатор тверь русская до машины в хорошем",
]

# q25: the ten lexicographically-smallest phrase rows
PT_Q25 = [
    ("$_poslandon.ru/moscow 2 торговлю", 1),
    ("'kbnyjuj jntktdbpjhjdjls", 1),
    ("'ktrnhjkm d .,rf[ gjvbljhjujv d uhtwbb d ;tkelrt", 1),
    ("(http://kommediapad guetta but you", 1),
    ("(http://kommedium=cpc&utm_source=main произвестивозачать на "
     "автомобиле", 1),
    ("(http://kommedovico - петухово-бенц cv инстрогое неделю отель", 1),
    ("01 рд 2013", 1),
    ("096 маяки самсунг галище послез", 1),
    ("0976", 2),
]

# q10/q11 mobile plan: (MobilePhone, model, distinct_users)
PT_MOBILE = [
    (1, "iPad", 1081), (5, "iPad", 49), (6, "iPad", 42),
    (26, "iPhone", 19), (7, "iPad", 18), (32, "iPad", 17),
    (6, "iPhone", 17), (10, "iPad", 15), (5, "N8-00", 9),
    (7, "iPhone", 9),
    # u ≤ 8 remainders so q11's tenth row stays (7, iPhone, 9)
    (40, "iPad", 8), (41, "iPad", 8), (42, "iPad", 8), (43, "iPad", 4),
    (27, "iPhone", 8), (28, "iPhone", 1),
    (1, "A500", 7), (1, "3110000", 5), (1, "ONE TOUCH 6030A", 5),
    (1, "LG/P760/V1", 4), (1, "5250", 3), (1, "GT-I9100", 2),
    (1, "GT-I9500", 2),
]

_PT_DAY_MIN = 15888    # 2013-07-02 (q06 min)
_PT_DAY_MAX = 15917    # 2013-07-31 (q06 max)
_PT_DAY_C62 = 15906    # 2013-07-20: outside q42's 07-14..15 window


def _allocate_phrases(consumers):
    """Feed q30 consumer row-demands from the PT_PHRASE_PLAN pools, then
    mint small users so each phrase lands on exactly u_target distinct
    users (q13) with per-(se,phrase) row counts preserved (q14).

    consumers: list of (key, se, demand).  Returns
    (consumer_takes: key → [(phrase, se, n)], smalls: [(phrase, se, n)]
    grouped per small user as a list of single-group users).
    """
    rows_left = {}      # (phrase, se) → rows
    users_left = {}     # phrase → user slots
    for ph, (per_se, u) in PT_PHRASE_PLAN.items():
        users_left[ph] = u
        for se, n in per_se.items():
            rows_left[(ph, se)] = n
    takes = {k: [] for k, _, _ in consumers}
    for key, se, demand in consumers:
        left = demand
        pools = sorted((p for p in rows_left if p[1] == se),
                       key=lambda p: -rows_left[p])
        for ph, _se in pools:
            if left == 0:
                break
            total_ph = sum(v for (p2, _s2), v in rows_left.items()
                           if p2 == ph)
            # leave ≥1 row per remaining user slot of this phrase
            cap = min(rows_left[(ph, se)], total_ph - (users_left[ph] - 1))
            take = min(left, cap)
            if take <= 0:
                continue
            takes[key].append((ph, se, take))
            rows_left[(ph, se)] -= take
            users_left[ph] -= 1
            left -= take
        assert left == 0, (key, se, left)
    # phase 2: small users close each phrase exactly
    smalls = []
    for ph in PT_PHRASE_PLAN:
        pools = [(se, rows_left[(ph, se)]) for (p2, se) in rows_left
                 if p2 == ph and rows_left[(p2, se)] > 0]
        n_users = users_left[ph]
        total = sum(r for _se, r in pools)
        assert len(pools) <= n_users <= total, (ph, n_users, pools)
        # seed each pool with enough users to keep every chunk ≤ 12 rows
        # (small (se,ip) groups must stay under the q30 cutoff), then
        # spread the spare user slots across the largest pools
        per_pool = {se: max(1, -(-r // 12)) for se, r in pools}
        spare = n_users - sum(per_pool.values())
        assert spare >= 0, (ph, n_users, per_pool)
        for se, r in sorted(pools, key=lambda t: -t[1]):
            extra = min(spare, r - per_pool[se])
            per_pool[se] += extra
            spare -= extra
        assert spare == 0, (ph, spare)
        for se, r in pools:
            k = per_pool[se]
            base, rem = divmod(r, k)
            assert base + 1 <= 12, (ph, se, base)   # (se,ip) cap (q30)
            for i in range(k):
                smalls.append((ph, se, base + (1 if i < rem else 0)))
    return takes, smalls


def _build_partitioned_rows() -> list[dict]:
    users: list[_User] = []

    def mk(uid, ip=None, empty=0):
        u = _User(uid, ip, empty)
        users.append(u)
        return u

    # --- q17 smallest users
    for uid, empty, groups in PT_SMALLEST:
        u = mk(uid, empty=empty)
        for ph, n in groups:
            u.groups.append((ph, 4, n, None, 0))

    # --- q15/q16/q35 top users + q18 minute pins
    top_by_uid = {}
    for uid, total, empty, ip in PT_TOP_USERS:
        u = mk(uid, ip, empty=empty)
        u.minute_pins = PT_MINUTE_PINS.get(uid, {})
        top_by_uid[uid] = (u, total - empty)
    for uid, empty, pins in PT_MINUTE_USERS:
        u = mk(uid, empty=empty)
        u.minute_pins = pins

    nid = [5_000_000_000_000]

    def small(ip=None, empty=0):
        nid[0] += 1
        return mk(nid[0], ip, empty)

    # --- q30 consumers + top-user non-empty rows through the allocator
    consumers = []
    consumer_user = {}
    for se, ip, n, refresh, rw in PT_Q30:
        u = small(ip)
        consumer_user[ip] = (u, rw, refresh)
        consumers.append((ip, se, n))
    for uid, total, empty, _ip in PT_TOP_USERS:
        ne = total - empty
        if ne:
            u, _ = top_by_uid[uid]
            consumer_user[uid] = (u, None, 0)
            consumers.append((uid, 2, ne))
    takes, smalls = _allocate_phrases(consumers)
    for key, groups in takes.items():
        u, rw, refresh = consumer_user[key]
        rf_left = refresh
        for ph, se, n in groups:
            rf = min(rf_left, n)
            u.groups.append((ph, se, n, rw, rf))
            rf_left -= rf
        assert rf_left == 0, (key, rf_left)
    for ph, se, n in smalls:
        u = small()
        u.groups.append((ph, se, n, None, 0))

    # --- q31 pinned-WatchID owners: 1 filler-phrase row each
    filler_i = [0]

    def filler_phrase():
        filler_i[0] += 1
        return f"тема {filler_i[0]:05d} простое разное"

    for _wid, ip, _rf, _rw in PT_W_SMALL:
        u = small(ip)
        u.groups.append((filler_phrase(), 4, 1, None, 0))

    # --- q24 phrase owners (early EventTime rows), q25, q21, q22
    early_counts = {}
    for ph in PT_EARLY_ORDER:
        early_counts[ph] = early_counts.get(ph, 0) + 1
    for ph, n in early_counts.items():
        u = small()
        u.groups.append((ph, 4, n, None, 0))
    for ph, n in PT_Q25:
        u = small()
        u.groups.append((ph, 4, n, None, 0))
    q21_user = small()
    q21_user.groups.append((PT_Q21[0], 4, 1, None, 0))
    q22_users = []
    for ph, _url, _title in PT_Q22:
        u = small()
        u.groups.append((ph, 4, 1, None, 0))
        q22_users.append(u)

    # --- CounterID=62 block (q36/q37; q38-q42 stay empty by construction)
    c62_rows_n = sum(n for _t, n in PT_C62_TITLES)
    c62a = small(empty=c62_rows_n // 2)
    c62b = small(empty=c62_rows_n - c62_rows_n // 2)
    c62_users = {c62a, c62b}
    # --- the 42 ''-phrase google-URL rows (q20)
    google_user = small(empty=PT_GOOGLE_EMPTY)

    # --- filler phrases to reach exactly 8124 distinct values
    named = {ph for ph in PT_PHRASE_PLAN}
    named |= {ph for ph, *_ in PT_Q22} | {ph for ph, _n in PT_Q25}
    named |= set(PT_EARLY_ORDER) | {PT_Q21[0], ""}
    named |= {ph for _u, _e, gs in PT_SMALLEST for ph, _n in gs}
    n_filler = PT_PHRASES - len(named) - filler_i[0]
    assert n_filler > 0
    for _ in range(n_filler):
        u = small()
        u.groups.append((filler_phrase(), 4, 1, None, 0))

    # --- pads
    n_pads = PT_USERS - len(users)
    assert n_pads > 2000, n_pads
    pads = []
    for _wid, ip, _rf, _rw in PT_W_BIG:
        p = mk(0, ip, empty=1)
        p.is_pad = True
        pads.append(p)
    for _ in range(n_pads - len(PT_W_BIG)):
        p = mk(0, None, empty=1)
        p.is_pad = True
        pads.append(p)

    # --- regions, pad sizing, uid steering
    specs = [(r, c, uq) for r, (c, _a, _w, uq) in PT_REGIONS.items()]
    specs += [(r, cu[0], cu[1]) for r, cu in PT_Q08_REGIONS.items()]
    _assign_regions_generic(
        users, pads, specs, total_rows=PT_TOTAL,
        other_user_cap=263, other_row_cap=1324, pad_row_cap=294,
        other_rid_base=20_001,
    )
    _steer_user_ids_generic(
        users, pads, PT_AVG_USER, PT_TOTAL, PT_USERS,
        uid_floor=max(uid for uid, _e, _g in PT_SMALLEST),
    )

    # unique IPs
    seen_ips = {u.ip for u in users if u.ip is not None}
    nxt = 100_000
    for u in users:
        if u.ip is None:
            while nxt in seen_ips:
                nxt += 1
            u.ip = nxt
            seen_ips.add(nxt)

    # --- materialize
    rows: list[dict] = []
    w_small_left = {}
    for t in PT_W_SMALL:
        w_small_left.setdefault(t[1], []).append(t)
    w_big_left = {}
    for t in PT_W_BIG:
        w_big_left.setdefault(t[1], []).append(t)
    next_ne = [4_620_000_000_000_000_000]
    next_e = [6_000_000_000_000_000_000]
    early_idx = {}
    for i, ph in enumerate(PT_EARLY_ORDER):
        early_idx.setdefault(ph, []).append(i)
    hour_cycle = [0]

    def ev_time(minute):
        hour_cycle[0] = hour_cycle[0] % 22 + 1
        return _T0 + hour_cycle[0] * 3600 + minute * 60 + len(rows) % 60

    for u in users:
        for phrase, se, n, rw, refresh_n in u.groups:
            made_refresh = 0
            for k in range(n):
                r = {"UserID": u.uid, "ClientIP": u.ip,
                     "RegionID": u.region, "SearchPhrase": phrase,
                     "SearchEngineID": se}
                if early_idx.get(phrase):
                    r["EventTime"] = _T0 + early_idx[phrase].pop(0)
                else:
                    r["EventTime"] = ev_time((k // 12 * 7 + _shash(phrase))
                                             % 60)
                pin = w_small_left.get(u.ip)
                if pin:
                    wid, _ip, rf, prw = pin.pop(0)
                    r["WatchID"] = wid
                    r["IsRefresh"] = rf
                    r["ResolutionWidth"] = prw
                    r["__rw_pinned"] = True
                    made_refresh += rf
                else:
                    next_ne[0] += 1
                    r["WatchID"] = next_ne[0]
                    if made_refresh < refresh_n:
                        r["IsRefresh"] = 1
                        made_refresh += 1
                    if rw is not None:
                        r["ResolutionWidth"] = rw
                        r["__rw_pinned"] = True
                rows.append(r)
        minutes = []
        for m, cnt in sorted(u.minute_pins.items()):
            minutes += [m] * cnt
        allowed = [m for m in range(60) if m not in u.minute_pins]
        k = 0
        base = abs(u.uid) % len(allowed)
        while len(minutes) < u.empty:
            minutes.append(allowed[(base + k // 12) % len(allowed)])
            k += 1
        for m in minutes:
            r = {"UserID": u.uid, "ClientIP": u.ip,
                 "RegionID": u.region, "EventTime": ev_time(m)}
            pin = w_big_left.get(u.ip)
            if pin:
                wid, _ip, rf, prw = pin.pop(0)
                r["WatchID"] = wid
                r["IsRefresh"] = rf
                r["ResolutionWidth"] = prw
                r["__rw_pinned"] = True
            else:
                next_e[0] += 1
                r["WatchID"] = next_e[0]
            if u in c62_users:
                r["CounterID"] = 62
                r["EventDate"] = _PT_DAY_C62
            rows.append(r)

    assert len(rows) == PT_TOTAL, len(rows)
    assert not any(w_small_left.values()) and not any(w_big_left.values())

    # --- q06 date sentinels on two plain pad rows
    sentinels = 0
    for r in rows:
        if ("SearchPhrase" not in r and "CounterID" not in r
                and not r.get("__rw_pinned")):
            r["EventDate"] = _PT_DAY_MIN if sentinels == 0 else _PT_DAY_MAX
            sentinels += 1
            if sentinels == 2:
                break
    assert sentinels == 2

    # --- AdvEngineID placement (skip CounterID=62 rows: q39 group cap)
    by_region: dict[int, list[dict]] = {}
    for r in rows:
        by_region.setdefault(r["RegionID"], []).append(r)
    placed = dict.fromkeys(PT_ADV, 0)
    for reg, plan in PT_ADV_REGION.items():
        cand = [r for r in by_region[reg] if "CounterID" not in r]
        i = 0
        for val, cnt in plan.items():
            for _ in range(cnt):
                cand[i]["AdvEngineID"] = val
                placed[val] += 1
                i += 1
    leftover_plan = {v: PT_ADV[v] - placed[v] for v in PT_ADV}
    assert all(n >= 0 for n in leftover_plan.values()), leftover_plan
    other_pool = [r for reg, rl in by_region.items()
                  if reg not in PT_ADV_REGION
                  for r in rl if "CounterID" not in r]
    i = 0
    for val, cnt in leftover_plan.items():
        for _ in range(cnt):
            other_pool[i]["AdvEngineID"] = val
            placed[val] += 1
            i += 1
    assert placed == PT_ADV, placed
    adv_check = sum(r.get("AdvEngineID", 0) for r in rows)
    assert adv_check == sum(v * n for v, n in PT_ADV.items()), adv_check

    # --- ResolutionWidth balancing (q09 region averages + q02 global sum)
    targets = {reg: round(avg * c)
               for reg, (c, _a2, avg, _u2) in PT_REGIONS.items()}
    assert all(abs(targets[g] - PT_REGIONS[g][2] * PT_REGIONS[g][0]) < 0.51
               for g in PT_REGIONS)
    other_regs = [g for g in by_region if g not in targets]
    leftover = PT_RW_SUM - sum(targets.values())
    other_total = sum(len(by_region[g]) for g in other_regs)
    for g in other_regs:
        targets[g] = leftover * len(by_region[g]) // other_total
    for g, rl in by_region.items():
        free = [r for r in rl if not r.get("__rw_pinned")]
        pinned_sum = sum(r.get("ResolutionWidth", 0) for r in rl
                         if r.get("__rw_pinned"))
        want = targets[g] - pinned_sum
        assert free, f"region {g} lacks free rows"
        base, rem = divmod(want, len(free))
        assert 0 <= base <= 32_000, (g, base)
        for i, r in enumerate(free):
            r["ResolutionWidth"] = base + (1 if i < rem else 0)
    crumbs = PT_RW_SUM - sum(r.get("ResolutionWidth", 0) for r in rows)
    fixer = next(r for r in by_region[other_regs[0]]
                 if not r.get("__rw_pinned"))
    fixer["ResolutionWidth"] += crumbs
    assert 0 <= fixer["ResolutionWidth"] <= 32_767
    assert sum(r.get("ResolutionWidth", 0) for r in rows) == PT_RW_SUM

    # --- URLs and Titles
    # CounterID=62 rows: q36 URL histogram + q37 Title histogram
    c62_rows = [r for r in rows if r.get("CounterID") == 62]
    assert len(c62_rows) == c62_rows_n
    i = 0
    for url, cnt in PT_C62_URLS:
        for _ in range(cnt):
            c62_rows[i]["URL"] = url
            i += 1
    i = 0
    for title, cnt in PT_C62_TITLES:
        for _ in range(cnt):
            c62_rows[i]["Title"] = title
            i += 1
    # google rows: q20/q21
    g_rows = [r for r in rows if r.get("UserID") == google_user.uid]
    assert len(g_rows) == PT_GOOGLE_EMPTY
    for j, r in enumerate(g_rows):
        r["URL"] = f"http://bonprix.ru/mepps.google-ad{j:03d}"
    q21_row = next(r for r in rows
                   if r.get("SearchPhrase") == PT_Q21[0])
    q21_row["URL"] = PT_Q21[1]
    # q22 rows
    for ph, url, title in PT_Q22:
        r = next(rr for rr in rows if rr.get("SearchPhrase") == ph)
        r["URL"] = url
        r["Title"] = title
    # q33 histogram over the remaining rows
    url_seq: list[str] = []
    for url, cnt in PT_URL_PLAN:
        url_seq += [url] * cnt
    remaining = [r for r in rows
                 if "URL" not in r and r.get("CounterID") != 62]
    filler = len(remaining) - len(url_seq)
    fi = 0
    while filler > 0:
        take = min(300, filler)
        url_seq += [f"http://liver.ru/f{fi:04d}"] * take
        filler -= take
        fi += 1
    assert len(url_seq) == len(remaining)
    for r, url in zip(remaining, url_seq):
        r["URL"] = url

    # --- mobile (q10/q11)
    # c62a/c62b are non-pad users, so pads can all carry models freely
    pad_iter = iter(pads)
    first_row_of: dict[int, dict] = {}
    for r in rows:
        first_row_of.setdefault(r["UserID"], r)
    for phone, model, n_users in PT_MOBILE:
        for _ in range(n_users):
            p = next(pad_iter)
            fr = first_row_of[p.uid]
            fr["MobilePhone"] = phone
            fr["MobilePhoneModel"] = model

    for r in rows:
        r.pop("__rw_pinned", None)
        r["ClientEventTime"] = r["EventTime"]
        r["LocalEventTime"] = r["EventTime"]
    assert len({r["WatchID"] for r in rows}) == PT_TOTAL
    phrases = {r.get("SearchPhrase", "") for r in rows}
    assert len(phrases) == PT_PHRASES, len(phrases)
    assert len({r["UserID"] for r in rows}) == PT_USERS
    return rows


def _assign_regions_generic(users, pads, specs, *, total_rows,
                            other_user_cap, other_row_cap, pad_row_cap,
                            other_rid_base):
    specs = sorted(specs, key=lambda t: -t[1])
    nonpads = sorted((u for u in users if not u.is_pad),
                     key=lambda u: -u.total)
    placed = {r: [] for r, _, _ in specs}
    rows_in = {r: 0 for r, _, _ in specs}
    for u in nonpads:
        for r, c, uq in specs:
            slots_after = uq - len(placed[r]) - 1
            room = c - rows_in[r] - u.total
            if (len(placed[r]) < uq and room >= slots_after
                    and room <= slots_after * pad_row_cap):
                placed[r].append(u)
                rows_in[r] += u.total
                u.region = r
                break
        assert u.region is not None, f"user total={u.total} unplaced"
    pad_q = list(pads)
    for r, c, uq in specs:
        k = uq - len(placed[r])
        left = c - rows_in[r]
        assert k <= left <= k * pad_row_cap, (r, k, left)
        for i in range(k):
            p = pad_q.pop(0)
            p.region = r
            p.empty = left // k + (1 if i < left % k else 0)
    other_rows = total_rows - sum(c for _, c, _ in specs)
    rid = other_rid_base
    while pad_q:
        group = [pad_q.pop(0)
                 for _ in range(min(other_user_cap, len(pad_q)))]
        take = min(other_row_cap, other_rows - len(pad_q))
        take = max(take, len(group))
        if not pad_q:
            take = other_rows
        assert len(group) <= take <= other_row_cap, (take, len(group))
        for i, p in enumerate(group):
            p.region = rid
            p.empty = take // len(group) + (1 if i < take % len(group)
                                            else 0)
        other_rows -= take
        rid += 1
    assert other_rows == 0, other_rows
    total = sum(u.total for u in users)
    assert total == total_rows, total


def _steer_user_ids_generic(users, pads, avg_target, total_rows,
                            total_users, *, uid_floor):
    """Pick pad UserIDs steering AVG(UserID) onto the q03 golden.

    ``uid_floor`` is load-bearing: q17 pins the table's N smallest
    UserIDs exactly, so every pad uid must stay strictly above the
    largest pinned-smallest uid (r11 review #3)."""
    target_sum = int(avg_target * total_rows)
    pinned = sum(u.uid * u.total for u in users if not u.is_pad)
    pad_rows = sum(p.total for p in pads)
    per_row = (target_sum - pinned) // pad_rows
    assert uid_floor < per_row < 9.2e18, (per_row, uid_floor)
    for j, p in enumerate(pads):
        p.uid = per_row + j + 1
    uids = [u.uid for u in users]
    assert len(set(uids)) == len(uids) == total_users


_PT_GEN_VERSION = "partitioned-v1"


def ensure_partitioned(root: str) -> list[str]:
    """Build (idempotently) the partitioned-suite parquet files; returns
    the file paths. Strings are stored as un-annotated BINARY and
    EventDate as uint16, matching the reference files (the harness view
    casts both back, integration_slt.rs:388-421)."""
    outdir = os.path.join(root, "partitioned")
    stamp = os.path.join(outdir, ".generated")
    n_files = 10
    paths = [os.path.join(outdir, f"hits_truncated_{i}.parquet")
             for i in range(n_files)]
    if _stamp_fresh(stamp, _PT_GEN_VERSION, paths):
        return paths
    os.makedirs(outdir, exist_ok=True)
    rows = _build_partitioned_rows()
    chunk = (len(rows) + n_files - 1) // n_files
    for i, path in enumerate(paths):
        part = rows[i * chunk:(i + 1) * chunk]
        _write_atomic(_arrow_table(part, binary_strings=True), path)
    with open(stamp, "w") as fh:
        fh.write(_PT_GEN_VERSION)
    return paths


_GEN_VERSION = "single-v1"


def _write_atomic(table, path: str) -> None:
    """tmp + os.replace so a concurrent builder's reader never sees a
    truncated footer (r11 review #1; same pattern as slt.py's tpch
    dataset cache)."""
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _stamp_fresh(stamp: str, version: str, paths: list[str]) -> bool:
    """Fast path only when the stamp matches AND every data file exists
    (a deleted parquet next to a surviving stamp must rebuild, r11
    review #2)."""
    return (
        os.path.exists(stamp)
        and open(stamp).read().strip() == version
        and all(os.path.exists(p) for p in paths)
    )


def ensure_single(root: str) -> str:
    """Build (idempotently) and return the single-suite parquet path."""
    out = os.path.join(root, "single", "hits_truncated.parquet")
    stamp = out + ".generated"
    if _stamp_fresh(stamp, _GEN_VERSION, [out]):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rows = _build_single_rows()
    _write_atomic(_arrow_table(rows, binary_strings=False), out)
    with open(stamp, "w") as fh:
        fh.write(_GEN_VERSION)
    return out
