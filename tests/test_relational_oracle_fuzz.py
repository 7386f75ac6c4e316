"""Adversarial-corpus oracle parity for the relational (TPC-H-ish)
family — hostile but in-schema dimension and fact tables.

The generated corpus keeps TPC-H's benign value ranges (discounts
0-0.1, positive prices, spread dates). Production data has the other
shapes: discount exactly 1.0 (free item — zeroes revenue terms),
zero-quantity and zero-price lines, one order with thousands of
lines next to single-line orders, every line in one month (empty
comparison windows for MoM queries), customers with no orders,
orders with no lines, duplicate prices (percentile/histogram ties),
negative account balances, and single-member groups. This sweep runs
all 32 relational oracled queries on such tables.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q

QUERY_NAMES = [
    "grouping_sets_agg",
    "pivot_wide",
    "unpivot_long",
    "pricing_summary",
    "top_revenue_orders",
    "correlated_subquery",
    "nation_volume_shipping",
    "national_market_share",
    "order_priority_check",
    "customer_distribution",
    "promo_revenue",
    "returned_item_revenue",
    "local_supplier_volume",
    "forecast_revenue_change",
    "small_quantity_revenue",
    "large_volume_customers",
    "corr_stats",
    "profile_table",
    "group_topk_salted",
    "equidepth_histogram",
    "cube_agg",
    "price_histogram",
    "group_topk",
    "agg_groupby_stats",
    "window_running",
    "window_funcs",
    "scalar_funcs",
    "set_ops",
    "count_filter",
    "semi_anti_join",
    "rollup_agg",
    "join_pruned_dims",
]

_D0 = dt.datetime(1995, 1, 1)


def _mk_tables():
    regions = [(i, f"R{i}") for i in range(3)]
    nations = [(i, f"N{i}", i % 3) for i in range(6)]
    customers = []
    for i in range(40):
        bal = [-999.99, 0.0, 123.45, 1e7][i % 4]
        customers.append(
            (i, f"Customer#{i}", i % 6, bal, ["BUILDING", "AUTOMOBILE", "MACHINERY"][i % 3])
        )
    suppliers = [(i, f"Supplier#{i}", i % 6, float(i) - 3) for i in range(12)]
    parts = [
        (i, f"promo part {i}" if i % 3 == 0 else f"std part {i}",
         f"Brand#{i % 4}", "PROMO STEEL" if i % 3 == 0 else "STANDARD BRASS",
         (i % 7) + 1, round(900 + i * 0.5, 2))
        for i in range(25)
    ]
    orders, lineitems = [], []
    okey = 0

    def add_order(cust, status, total, date, prio, lines):
        nonlocal okey
        orders.append((okey, cust, status, total, date, prio))
        for ln, (pk, sk, qty, px, disc, tax, rf, ls, ship) in enumerate(lines, 1):
            lineitems.append((okey, pk, sk, ln, qty, px, disc, tax, rf, ls, ship))
        okey += 1

    day = dt.timedelta(days=1)
    # a giant order (200 lines) incl. discount == 1.0 and zero qty/price
    big = []
    for j in range(200):
        disc = 1.0 if j % 50 == 0 else (j % 11) / 100.0
        qty = 0.0 if j % 73 == 0 else float(j % 50) + 1
        px = 0.0 if j % 97 == 0 else round(100 + j * 1.5, 2)
        big.append((j % 25, j % 12, qty, px, disc, 0.04,
                    "R" if j % 3 == 0 else "N", "O", _D0 + (j % 28) * day))
    add_order(0, "O", 1e6, _D0, "1-URGENT", big)
    # single-line orders, duplicate prices (histogram/percentile ties)
    for i in range(1, 30):
        add_order(
            i % 40, "F" if i % 2 else "O", 500.0, _D0 + (i % 3) * 30 * day,
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i % 5],
            [(i % 25, i % 12, 5.0, 250.0, 0.05, 0.04, "A", "F", _D0 + i * day)],
        )
    # orders with NO lineitems (anti-join / count(0) buckets)
    for i in range(30, 36):
        orders.append((okey, i % 40, "O", 0.0, _D0 + 45 * day, "5-LOW"))
        okey += 1
    # all lines of these orders in ONE month (empty MoM windows)
    for i in range(36, 44):
        add_order(
            i % 40, "O", 750.0, _D0 + 100 * day, "2-HIGH",
            [(i % 25, i % 12, 2.0, 99.99, 0.0, 0.0, "N", "O", _D0 + 100 * day)],
        )
    return regions, nations, customers, suppliers, parts, orders, lineitems


@pytest.fixture(scope="module")
def nasty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nasty_rel_sf")
    regions, nations, customers, suppliers, parts, orders, lineitems = _mk_tables()

    def w(name, cols):
        pq.write_table(pa.table(cols), str(d / f"{name}.parquet"))

    w("region", {"r_regionkey": pa.array([r[0] for r in regions], pa.int32()),
                 "r_name": [r[1] for r in regions]})
    w("nation", {"n_nationkey": pa.array([n[0] for n in nations], pa.int32()),
                 "n_name": [n[1] for n in nations],
                 "n_regionkey": pa.array([n[2] for n in nations], pa.int32())})
    w("customer", {"c_custkey": pa.array([c[0] for c in customers], pa.int64()),
                   "c_name": [c[1] for c in customers],
                   "c_nationkey": pa.array([c[2] for c in customers], pa.int32()),
                   "c_acctbal": pa.array([c[3] for c in customers], pa.float64()),
                   "c_mktsegment": [c[4] for c in customers]})
    w("supplier", {"s_suppkey": pa.array([s[0] for s in suppliers], pa.int64()),
                   "s_name": [s[1] for s in suppliers],
                   "s_nationkey": pa.array([s[2] for s in suppliers], pa.int32()),
                   "s_acctbal": pa.array([s[3] for s in suppliers], pa.float64())})
    w("part", {"p_partkey": pa.array([p[0] for p in parts], pa.int64()),
               "p_name": [p[1] for p in parts],
               "p_brand": [p[2] for p in parts],
               "p_type": [p[3] for p in parts],
               "p_size": pa.array([p[4] for p in parts], pa.int32()),
               "p_retailprice": pa.array([p[5] for p in parts], pa.float64())})
    w("orders", {"o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                 "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                 "o_orderstatus": [o[2] for o in orders],
                 "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
                 "o_orderdate": pa.array([o[4] for o in orders], pa.timestamp("us")),
                 "o_orderpriority": [o[5] for o in orders]})
    w("lineitem", {"l_orderkey": pa.array([l[0] for l in lineitems], pa.int64()),
                   "l_partkey": pa.array([l[1] for l in lineitems], pa.int64()),
                   "l_suppkey": pa.array([l[2] for l in lineitems], pa.int64()),
                   "l_linenumber": pa.array([l[3] for l in lineitems], pa.int32()),
                   "l_quantity": pa.array([l[4] for l in lineitems], pa.float64()),
                   "l_extendedprice": pa.array([l[5] for l in lineitems], pa.float64()),
                   "l_discount": pa.array([l[6] for l in lineitems], pa.float64()),
                   "l_tax": pa.array([l[7] for l in lineitems], pa.float64()),
                   "l_returnflag": [l[8] for l in lineitems],
                   "l_linestatus": [l[9] for l in lineitems],
                   "l_shipdate": pa.array([l[10] for l in lineitems], pa.timestamp("us"))})
    import shutil

    for t in ("documents", "embeddings", "events"):
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet", str(d / f"{t}.parquet")
        )
    return str(d)


def _norm_hash(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if str(d[c].dtype) in ("float64", "float32"):
            d[c] = d[c].astype("float64").round(9)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in d.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_relational_query_matches_oracle_on_nasty_tables(spark, nasty_sf, name):
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{nasty_sf}/{t}.parquet'"
        )
    odf = con.sql(Q.ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rows spark={len(sdf)} oracle={len(odf)}"
    )
    if _norm_hash(sdf) != _norm_hash(odf):
        s_rows = sorted(
            tuple(str(v) for v in r)
            for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None)
        )
        o_rows = sorted(
            tuple(str(v) for v in r)
            for r in odf[sorted(odf.columns)].itertuples(index=False, name=None)
        )
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
            min(len(s_rows), len(o_rows)) - 1,
        )
        pytest.fail(
            f"{name}: value hash mismatch; first differing sorted row "
            f"#{diff}:\n  spark : {s_rows[diff]}\n  oracle: {o_rows[diff]}"
        )
