"""Deterministic FULL-SCHEMA TPC-H micro-fixture generator.

The driver fixtures are a slimmed TPC-H (no partsupp; ~10 spec columns
absent), which capped the verbatim-text proof at 7 of the reference's 22
query files. This generator synthesizes every table and column of the
reference's DDL (/root/reference/cases/tpch/query/ddl.sql) at micro scale
so ALL 22 spec texts (cases/tpch/query/q1.sql..q22.sql) run unmodified on
both engines over the SAME parquet.

Value pools follow the public TPC-H spec's distributions (nation/region
names and mapping, part type/container syllables, brands, priorities,
ship modes) — that is what makes the spec texts' literal predicates
('ECONOMY BURNISHED TIN', 'LG BAG', 'Brand#54', 'MIDDLE EAST', country
codes 10..34, ...) meaningful. On top of the random mass, a handful of
deterministic PLANTS guarantee every query is non-vacuous at this scale:

- part 0: p_size=48 + p_type 'ECONOMY BURNISHED TIN' (q2, q8; its
  supplier set {0,10,20,30} includes 10 = IRAN = MIDDLE EAST for q2).
- parts 10..13: Brand#54 + 'LG BAG' (q17).
- parts 1,11,21,31: p_name starting 'lime' (q20; supplier 21 = VIETNAM
  is in each of their supplier sets {p,(p+10)%40,...}).
- parts 20/21/22 + their lineitems: the three q19 branch combos.
- 8 orders with seven quantity-50 lineitems (q18's sum > 314).
- ~5% of o_comment match '%pending%accounts%' (q13), 2 suppliers'
  s_comment match '%Customer%Complaints%' (q16).
- customers 390+ never order (q22's NOT EXISTS arm).
- supplier/customer nations are round-robin (key % 25), so every nation
  has suppliers and customers (q5 same-nation trade, q7 FRANCE/ARGENTINA
  both directions, q11 JAPAN, q21 BRAZIL).

Everything is a pure function of the seed: same seed -> byte-identical
tables -> stable expected results across rounds.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = np.datetime64("1970-01-01")


def _dates(days: np.ndarray) -> np.ndarray:
    return EPOCH + days.astype("timedelta64[D]")


REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# spec nation -> region mapping, by n_nationkey
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
TYPE1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONT1 = ["SM", "MED", "LG", "WRAP", "JUMBO"]
CONT2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished", "chartreuse",
    "chiffon", "chocolate", "coral", "cornflower", "cream", "cyan", "dark",
    "deep", "dim", "dodger", "drab", "firebrick", "floral", "forest", "frosted",
    "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew", "hot",
    "indian", "ivory", "khaki", "lace", "lavender", "lawn", "lemon", "light",
    "lime", "linen", "magenta", "maroon", "medium", "metallic", "midnight",
    "mint", "misty", "moccasin", "navajo", "navy", "olive", "orange", "orchid",
    "pale", "papaya", "peach", "peru", "pink", "plum", "powder", "puff",
    "purple", "red", "rose", "rosy", "royal", "saddle", "salmon", "sandy",
    "seashell", "sienna", "sky", "slate", "smoke", "snow", "spring", "steel",
    "tan", "thistle", "tomato", "turquoise", "violet", "wheat", "white",
    "yellow",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
WORDS = (
    "carefully final deposits sleep furiously above the slyly ironic "
    "requests haggle blithely regular accounts pending packages boost "
    "quickly express ideas nag fluffily bold theodolites integrate daring "
    "foxes among even instructions wake special platelets"
).split()

N_NAT = 25
N_SUPP = 40
N_PART = 300
N_CUST = 450
N_ORD = 4500


def _comments(rng: np.random.RandomState, n: int, k: int) -> np.ndarray:
    idx = rng.randint(0, len(WORDS), size=(n, k))
    return np.array([" ".join(WORDS[j] for j in row) for row in idx])


def _money(rng: np.random.RandomState, n: int, lo: float, hi: float) -> np.ndarray:
    return np.round(rng.uniform(lo * 100, hi * 100, n)) / 100.0


def generate(out_dir: str, seed: int = 20260816) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    def write(name: str, cols: dict) -> None:
        pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))

    # ------------------------------------------------------------ region
    write("region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": REGIONS,
        "r_comment": _comments(rng, 5, 8),
    })

    # ------------------------------------------------------------ nation
    write("nation", {
        "n_nationkey": np.arange(N_NAT, dtype=np.int32),
        "n_name": [n for n, _ in NATIONS],
        "n_regionkey": np.array([r for _, r in NATIONS], dtype=np.int32),
        "n_comment": _comments(rng, N_NAT, 8),
    })

    # ---------------------------------------------------------- supplier
    sk = np.arange(N_SUPP, dtype=np.int64)
    s_comment = _comments(rng, N_SUPP, 10)
    # q16's NOT IN arm: two suppliers with complaint-shaped comments
    s_comment[7] = "slyly bold Customer deposits sleep Complaints"
    s_comment[23] = "Customer accounts nag Complaints furiously"
    write("supplier", {
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in sk],
        "s_address": _comments(rng, N_SUPP, 4),
        "s_nationkey": (sk % N_NAT).astype(np.int32),
        "s_phone": [
            f"{10 + i % N_NAT}-{rng.randint(100, 1000)}-{rng.randint(100, 1000)}"
            f"-{rng.randint(1000, 10000)}"
            for i in sk
        ],
        "s_acctbal": _money(rng, N_SUPP, -999.99, 9999.99),
        "s_comment": s_comment,
    })

    # -------------------------------------------------------------- part
    pk = np.arange(N_PART, dtype=np.int64)
    name_idx = rng.randint(0, len(COLORS), size=(N_PART, 5))
    p_name = np.array([" ".join(COLORS[j] for j in row) for row in name_idx])
    p_type = np.array([
        f"{TYPE1[rng.randint(6)]} {TYPE2[rng.randint(5)]} {TYPE3[rng.randint(5)]}"
        for _ in pk
    ])
    p_brand = np.array([f"Brand#{rng.randint(1, 6)}{rng.randint(1, 6)}" for _ in pk])
    p_size = rng.randint(1, 51, N_PART).astype(np.int32)
    p_container = np.array([
        f"{CONT1[rng.randint(5)]} {CONT2[rng.randint(8)]}" for _ in pk
    ])
    # plants (module docstring): q2/q8, q17, q20, q19 literal predicates
    p_size[0], p_type[0] = 48, "ECONOMY BURNISHED TIN"
    for i in (10, 11, 12, 13):
        p_brand[i], p_container[i] = "Brand#54", "LG BAG"
    for i in (1, 11, 21, 31):
        p_name[i] = "lime " + p_name[i]
    p_brand[20], p_container[20], p_size[20] = "Brand#23", "SM CASE", 3
    p_brand[21], p_container[21], p_size[21] = "Brand#15", "MED BOX", 7
    p_brand[22], p_container[22], p_size[22] = "Brand#44", "LG PACK", 12
    write("part", {
        "p_partkey": pk,
        "p_name": p_name,
        "p_mfgr": [f"Manufacturer#{rng.randint(1, 6)}" for _ in pk],
        "p_brand": p_brand,
        "p_type": p_type,
        "p_size": p_size,
        "p_container": p_container,
        "p_retailprice": _money(rng, N_PART, 900.0, 2000.0),
        "p_comment": _comments(rng, N_PART, 3),
    })

    # ---------------------------------------------------------- partsupp
    ps_part = np.repeat(pk, 4)
    ps_supp = np.array(
        [(p + 10 * i) % N_SUPP for p in pk for i in range(4)], dtype=np.int64
    )
    write("partsupp", {
        "ps_partkey": ps_part,
        "ps_suppkey": ps_supp,
        "ps_availqty": rng.randint(1, 10000, len(ps_part)).astype(np.int32),
        "ps_supplycost": _money(rng, len(ps_part), 1.0, 1000.0),
        "ps_comment": _comments(rng, len(ps_part), 12),
    })

    # ---------------------------------------------------------- customer
    ck = np.arange(N_CUST, dtype=np.int64)
    write("customer", {
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in ck],
        "c_address": _comments(rng, N_CUST, 4),
        "c_nationkey": (ck % N_NAT).astype(np.int32),
        "c_phone": [
            f"{10 + i % N_NAT}-{rng.randint(100, 1000)}-{rng.randint(100, 1000)}"
            f"-{rng.randint(1000, 10000)}"
            for i in ck
        ],
        "c_acctbal": _money(rng, N_CUST, -999.99, 9999.99),
        "c_mktsegment": np.array(SEGMENTS)[rng.randint(0, 5, N_CUST)],
        "c_comment": _comments(rng, N_CUST, 10),
    })

    # ------------------------------------------------------------ orders
    ok = np.arange(N_ORD, dtype=np.int64) * 4 + 1  # sparse keys like dbgen
    # customers 390+ never order -> q22's NOT EXISTS is non-vacuous
    o_cust = rng.randint(0, 390, N_ORD).astype(np.int64)
    o_days = rng.randint(8036, 10441, N_ORD)  # 1992-01-01 .. 1998-08-01
    o_comment = _comments(rng, N_ORD, 7)
    pend = rng.rand(N_ORD) < 0.05
    o_comment[pend] = np.array([
        f"{WORDS[rng.randint(len(WORDS))]} pending {WORDS[rng.randint(len(WORDS))]}"
        f" accounts {WORDS[rng.randint(len(WORDS))]}"
        for _ in range(int(pend.sum()))
    ])
    o_status = np.where(
        o_days < 9497, "F", np.where(rng.rand(N_ORD) < 0.5, "O", "P")
    )  # pre-1996 orders are Finished -> q21's o_orderstatus = 'F' arm
    write("orders", {
        "o_orderkey": ok,
        "o_custkey": o_cust,
        "o_orderstatus": o_status,
        "o_totalprice": _money(rng, N_ORD, 900.0, 400000.0),
        "o_orderdate": _dates(o_days),
        "o_orderpriority": np.array(PRIORITIES)[rng.randint(0, 5, N_ORD)],
        "o_clerk": [f"Clerk#{rng.randint(1, 1000):09d}" for _ in ok],
        "o_shippriority": np.zeros(N_ORD, dtype=np.int32),
        "o_comment": o_comment,
    })

    # ---------------------------------------------------------- lineitem
    n_items = rng.randint(1, 8, N_ORD)
    n_items[:8] = 7  # q18 plants: first 8 orders carry 7 max-quantity lines
    l_ok = np.repeat(ok, n_items)
    l_odays = np.repeat(o_days, n_items)
    n_li = len(l_ok)
    l_ln = np.concatenate([np.arange(1, k + 1) for k in n_items]).astype(np.int32)
    l_part = rng.randint(0, N_PART, n_li).astype(np.int64)
    # l_suppkey is one of the part's 4 partsupp suppliers (FK discipline)
    l_supp = ((l_part + 10 * rng.randint(0, 4, n_li)) % N_SUPP).astype(np.int64)
    l_qty = rng.randint(1, 51, n_li).astype(np.int32)
    l_qty[np.isin(l_ok, ok[:8])] = 50  # q18: sum(l_quantity) = 350 > 314
    l_ship = l_odays + rng.randint(1, 122, n_li)
    l_commit = l_odays + rng.randint(30, 91, n_li)
    l_receipt = l_ship + rng.randint(1, 31, n_li)
    l_mode = np.array(MODES)[rng.randint(0, len(MODES), n_li)]
    l_instr = np.array(INSTRUCT)[rng.randint(0, 4, n_li)]
    # q19 plants: the three branch combos on parts 20/21/22's lineitems
    for p, qlo in ((20, 5), (21, 14), (22, 28)):
        sel = np.flatnonzero(l_part == p)[::2]  # every other line qualifies
        l_mode[sel] = "AIR"
        l_instr[sel] = "DELIVER IN PERSON"
        l_qty[sel] = qlo + (sel % 10).astype(np.int32)
    ep = np.round(l_qty * _money(rng, n_li, 900.0, 1100.0) * 100) / 100
    write("lineitem", {
        "l_orderkey": l_ok,
        "l_partkey": l_part,
        "l_suppkey": l_supp,
        "l_linenumber": l_ln,
        "l_quantity": l_qty,
        "l_extendedprice": ep,
        "l_discount": rng.randint(0, 11, n_li) / 100.0,
        "l_tax": rng.randint(0, 9, n_li) / 100.0,
        "l_returnflag": np.where(
            l_receipt < 9200, np.where(rng.rand(n_li) < 0.5, "R", "A"), "N"
        ),
        "l_linestatus": np.where(l_ship > 9497, "O", "F"),
        "l_shipdate": _dates(l_ship),
        "l_commitdate": _dates(l_commit),
        "l_receiptdate": _dates(l_receipt),
        "l_shipinstruct": l_instr,
        "l_shipmode": l_mode,
        "l_comment": _comments(rng, n_li, 4),
    })
