#!/usr/bin/env python
"""Generate a NULL-riddled mirror of the testdata tables (NULL-parity net).

The driver fixtures at every SF contain ZERO NULLs in any column of any
table (verified r13), so the exact-hash oracle gate has never exercised
NULL semantics — the exact place Spark and DuckDB silently diverge
(NULLS FIRST/LAST defaults, NULL group keys, NULL join keys, aggregates
over all-NULL groups). This tool writes a tiny corpus with the SAME
physical parquet schemas as ``/root/testdata/sf*`` but NULLs injected
into every class of column (group keys, order keys, join keys,
aggregated measures, text), plus dangling foreign keys and boundary
rows. ``tools/check_queries.py`` pointed at it via
``SPARK_GRAFT_CHECK_SF`` sweeps every oracle-bearing registry entry on
it; ``tests/test_null_parity.py`` pins the sweep in CI.

Design constraints (so disagreements mean BUGS, not fixture noise):

* every float is a small binary fraction (multiples of 1/64) — sums and
  averages are exact in IEEE double regardless of reduction order, so
  the driver-style bitwise float compare stays meaningful;
* values that feed ORDER BY ... LIMIT boundaries are pairwise distinct —
  top-k row sets are uniquely determined (ties at a LIMIT boundary would
  make Spark-vs-DuckDB row sets legitimately diverge);
* primary keys stay unique and non-NULL; foreign keys, group keys,
  order keys and measures all carry NULLs.
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def _ts(day: int, hour: int = 0, minute: int = 0) -> datetime:
    return datetime(2024, 1 + (day - 1) // 28, 1 + (day - 1) % 28, hour, minute)


def _write(out_dir: str, name: str, schema: pa.Schema, cols: dict[str, list]) -> None:
    n = {len(v) for v in cols.values()}
    assert len(n) == 1, f"{name}: ragged columns {sorted((k, len(v)) for k, v in cols.items())}"
    table = pa.table({f.name: pa.array(cols[f.name], type=f.type) for f in schema}, schema=schema)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def write_corpus(out_dir: str) -> str:
    """Write all ten tables; returns out_dir."""
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.schema([
        ("r_regionkey", pa.int32()), ("r_name", pa.string()),
    ]), {
        "r_regionkey": [0, 1, 2, 3],
        "r_name": ["AMERICA", "ASIA", None, "EUROPE"],
    })

    _write(out_dir, "nation", pa.schema([
        ("n_nationkey", pa.int32()), ("n_name", pa.string()),
        ("n_regionkey", pa.int32()),
    ]), {
        "n_nationkey": [0, 1, 2, 3, 4, 5, 6],
        "n_name": ["BRAZIL", "CANADA", None, "FRANCE", "JAPAN", "KENYA", "PERU"],
        # one NULL FK, one dangling FK (99 has no region row)
        "n_regionkey": [0, 0, 1, 3, 1, None, 99],
    })

    _write(out_dir, "customer", pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]), {
        "c_custkey": list(range(1, 15)),
        "c_name": [f"Customer#{i:03d}" if i != 7 else None for i in range(1, 15)],
        "c_nationkey": [0, 1, 2, 3, 4, 5, 6, None, 98, 0, 1, 2, 3, 4],
        # distinct binary fractions, one negative, two NULLs
        "c_acctbal": [12.25, -3.5, 7.75, 100.0625, 55.5, None, 41.25,
                      8.125, -0.75, 63.0, 29.5, None, 91.75, 18.0625],
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", None, "MACHINERY", "BUILDING",
                         "HOUSEHOLD", "FURNITURE", "BUILDING", None, "AUTOMOBILE",
                         "MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING"],
    })

    _write(out_dir, "supplier", pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
    ]), {
        "s_suppkey": [1, 2, 3, 4, 5, 6, 7],
        "s_name": ["Supplier#001", "Supplier#002", "Supplier#003", None,
                   "Supplier#005", "Supplier#006", "Supplier#007"],
        "s_nationkey": [0, 1, 2, None, 4, 99, 3],
        "s_acctbal": [500.25, -12.5, None, 77.75, 310.0625, 42.5, 0.0],
    })

    _write(out_dir, "part", pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ]), {
        "p_partkey": list(range(1, 13)),
        "p_name": ["azure steel box", "burnished copper wheel", None,
                   "dim chocolate cog", "forest brass gear", "green tin plate",
                   "hot pink rod", "ivory zinc screw", "jade nickel bolt",
                   "khaki iron nut", "lime bronze pin", "misty silver cap"],
        "p_brand": ["Brand#11", "Brand#12", "Brand#11", None, "Brand#13",
                    "Brand#12", "Brand#11", "Brand#13", None, "Brand#12",
                    "Brand#11", "Brand#13"],
        "p_type": ["SMALL PLATED", "LARGE BRUSHED", "SMALL PLATED", "MEDIUM ANODIZED",
                   None, "LARGE BRUSHED", "SMALL POLISHED", "MEDIUM ANODIZED",
                   "SMALL PLATED", None, "LARGE POLISHED", "SMALL BRUSHED"],
        "p_size": [1, 5, 10, None, 23, 5, 0, 15, 49, 12, None, 3],
        "p_retailprice": [901.0, 902.25, None, 904.5, 905.125, 906.75,
                          907.0625, 908.5, None, 910.25, 911.0, 912.375],
    })

    _write(out_dir, "orders", pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ]), {
        "o_orderkey": list(range(1, 25)),
        "o_custkey": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                      1, 2, 3, None, 5, None, 999, 8, 9, 10],
        "o_orderstatus": ["O", "F", "O", "P", "F", "O", None, "F", "O", "P",
                          "F", "O", "F", None, "O", "F", "O", "P", "F", "O",
                          "F", "O", "P", "F"],
        # pairwise-distinct binary fractions (ORDER BY/LIMIT determinism)
        "o_totalprice": [1001.25, 1002.5, 1003.75, None, 1005.0625, 1006.5,
                         1007.25, 1008.125, None, 1010.75, 1011.5, 1012.25,
                         1013.0625, 1014.5, 1015.25, 1016.75, 1017.125,
                         1018.5, 1019.25, 1020.0625, 1021.5, 1022.75,
                         1023.25, 1024.125],
        "o_orderdate": [_ts(d) for d in (1, 3, 5, 8, 10, 12, 15, 17, 20, 22,
                                         25, 28, 31, 33)] + [None, None] +
                       [_ts(d) for d in (36, 40, 44, 48, 52, 56, 60, 64)],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                            "5-LOW", None, "1-URGENT", "2-HIGH", "3-MEDIUM",
                            "5-LOW", "1-URGENT", None, "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW", "1-URGENT", "2-HIGH",
                            None, "3-MEDIUM", "5-LOW", "1-URGENT", "2-HIGH",
                            "4-NOT SPECIFIED"],
    })

    li_n = 40
    _write(out_dir, "lineitem", pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]), {
        # two NULL order FKs, one dangling (777)
        "l_orderkey": [1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                       15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 1, 2, 3,
                       None, None, 777, 5, 6, 7, 8, 9, 10, 11, 12, 13],
        "l_partkey": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 1, 2, 3,
                      4, 5, 6, 7, 8, None, 10, 11, 12, 1, 2, 3, 4,
                      5, 6, 7, 8, 9, None, 11, 12, 555, 2, 3, 4],
        "l_suppkey": [1, 2, 3, 4, 5, 6, 7, 1, 2, 3, 4, 5, 6, 7, 1,
                      2, 3, None, 5, 6, 7, 1, 2, 3, 4, 5, 6, 7,
                      1, 2, 3, 4, None, 6, 7, 1, 2, 3, 444, 5],
        "l_linenumber": [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                         1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 3, 2, 2,
                         1, 2, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2],
        "l_quantity": [float(q) if q is not None else None for q in
                       (1, 2, 3, 4, 5, None, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                        16, 17, 18, 19, None, 21, 22, 23, 24, 25, 26, 27, 28,
                        29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40)],
        # distinct multiples of 0.25 (exact double sums in any order)
        "l_extendedprice": [100.25 + 7.25 * i if i not in (5, 23) else None
                            for i in range(li_n)],
        "l_discount": [(0.0, 0.0625, 0.125, None)[i % 4] for i in range(li_n)],
        "l_tax": [(0.03125, 0.0, None, 0.0625, 0.09375)[i % 5] for i in range(li_n)],
        "l_returnflag": [("R", "A", "N", None, "R", "A", "N", "R")[i % 8]
                         for i in range(li_n)],
        "l_linestatus": [("O", "F", None, "O", "F", "O")[i % 6] for i in range(li_n)],
        "l_shipdate": [(_ts(2 + 2 * i) if i % 9 != 7 else None) for i in range(li_n)],
    })

    ev_n = 30
    # index 7 is a NULL-user CLICK with a real ts and index 20 a
    # NULL-user PURCHASE after it: the pair exercises q12's rule that an
    # unattributable (NULL-user) click matches nothing (code-review r13)
    users = [7, 7, 8, 9, None, 7, 8, None, 10, 7, 8, None, 9, 10, 7,
             8, 9, 10, 7, 8, None, 9, 10, 7, 8, 9, 10, 7, 8, 9]
    etypes = [("view", "click", "purchase", None, "view", "click")[i % 6]
              for i in range(ev_n)]
    _write(out_dir, "events", pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]), {
        "event_id": list(range(1, ev_n + 1)),
        # distinct (hour, minute) pairs, two NULLs — order keys stay
        # unique ((3*i) % 60 alone wraps at i=20; the hour step keeps
        # the promise — code-review r13)
        "ts": [(_ts(1, 9 + i // 20, (3 * i) % 60) if i not in (11, 26) else None)
               for i in range(ev_n)],
        "user_id": users,
        "event_type": etypes,
        "value": [(2.25 + 0.8125 * i if i % 7 != 4 else None) for i in range(ev_n)],
        "props": [('{"k":%d,"tag":"t%d"}' % (i, i % 3)) if i % 5 != 3 else None
                  for i in range(ev_n)],
    })

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        None,
        "",
        "single",
        "the quick brown fox jumps over the lazy dog",  # exact dup of doc 1
        "sphinx of black quartz judge my vow sphinx of black quartz",
        "data pipelines shuffle partitions and broadcast joins at scale",
        "a a a a a a a a a a a a",
        "mixed CASE Tokens And   irregular   whitespace here",
    ]
    _write(out_dir, "documents", pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]), {
        "doc_id": list(range(1, 11)),
        "text": texts,
        "lang": ["en", "en", None, "en", "de", "en", None, "en", "xx", "en"],
        "source": ["web", "books", "web", None, "code", "web", "books",
                   None, "web", "code"],
        "n_chars": [len(t) if t is not None else None for t in texts],
    })

    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.5, 0.5, 0.0, 0.0],
        [0.25, 0.25, 0.25, 0.25],
        [0.0, 0.0, 0.0, 0.0],          # zero vector (norm guard)
        [0.75, -0.25, 0.5, 0.125],
        [-0.5, 0.5, -0.5, 0.5],
        None,                           # NULL embedding
        [0.125, 0.25, 0.375, 0.5],
        [1.0, 1.0, 1.0, 1.0],
    ]
    _write(out_dir, "embeddings", pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]), {
        "vec_id": list(range(10)),
        "embedding": vecs,
        "label": [0, 1, 0, 1, 2, None, 1, 0, 2, None],
    })

    return out_dir


def write_tie_corpus(out_dir: str) -> str:
    """Write all ten tables with HEAVY TIES and no NULLs (the determinism
    net): every order/measure column draws from a tiny value set, so any
    ORDER BY ... LIMIT, row_number, lag or rank whose ordering is not
    total (missing a unique tiebreaker on EITHER side of a query/oracle
    pair) picks engine-arbitrary rows and diverges. Primary keys stay
    unique; NULLs are deliberately absent so a failure here is a
    tie-determinism bug, not a NULL-semantics one."""
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.schema([
        ("r_regionkey", pa.int32()), ("r_name", pa.string()),
    ]), {
        "r_regionkey": [0, 1, 2, 3],
        "r_name": ["AMERICA", "ASIA", "ASIA", "EUROPE"],  # duplicate name
    })

    _write(out_dir, "nation", pa.schema([
        ("n_nationkey", pa.int32()), ("n_name", pa.string()),
        ("n_regionkey", pa.int32()),
    ]), {
        "n_nationkey": [0, 1, 2, 3, 4, 5],
        "n_name": ["BRAZIL", "BRAZIL", "CANADA", "CANADA", "JAPAN", "JAPAN"],
        "n_regionkey": [0, 0, 1, 1, 2, 2],
    })

    _write(out_dir, "customer", pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]), {
        "c_custkey": list(range(1, 13)),
        "c_name": [f"Customer#{i % 3:03d}" for i in range(1, 13)],  # 3 names
        "c_nationkey": [(0, 1, 2)[i % 3] for i in range(12)],
        "c_acctbal": [(10.5, 20.25)[i % 2] for i in range(12)],  # 2 values
        "c_mktsegment": [("BUILDING", "MACHINERY")[i % 2] for i in range(12)],
    })

    _write(out_dir, "supplier", pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
    ]), {
        "s_suppkey": [1, 2, 3, 4, 5, 6],
        "s_name": ["Supplier#A", "Supplier#A", "Supplier#B", "Supplier#B",
                   "Supplier#C", "Supplier#C"],
        "s_nationkey": [0, 0, 1, 1, 2, 2],
        "s_acctbal": [50.5, 50.5, 70.25, 70.25, 50.5, 70.25],
    })

    _write(out_dir, "part", pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ]), {
        "p_partkey": list(range(1, 11)),
        "p_name": [("azure steel box", "green tin plate")[i % 2] for i in range(10)],
        "p_brand": [("Brand#11", "Brand#12")[i % 2] for i in range(10)],
        "p_type": [("SMALL PLATED", "LARGE BRUSHED")[i % 2] for i in range(10)],
        "p_size": [(5, 10)[i % 2] for i in range(10)],
        "p_retailprice": [(900.25, 901.5)[i % 2] for i in range(10)],
    })

    n_ord = 24
    ts3 = [_ts(1, 10), _ts(15, 10), _ts(30, 10)]
    _write(out_dir, "orders", pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ]), {
        "o_orderkey": list(range(1, n_ord + 1)),
        "o_custkey": [(i % 12) + 1 for i in range(n_ord)],
        "o_orderstatus": [("O", "F")[i % 2] for i in range(n_ord)],
        "o_totalprice": [(1000.25, 2000.5)[i % 2] for i in range(n_ord)],
        "o_orderdate": [ts3[i % 3] for i in range(n_ord)],
        "o_orderpriority": [("1-URGENT", "3-MEDIUM", "5-LOW")[i % 3]
                            for i in range(n_ord)],
    })

    li_n = 40
    _write(out_dir, "lineitem", pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]), {
        "l_orderkey": [(i % n_ord) + 1 for i in range(li_n)],
        "l_partkey": [(i % 10) + 1 for i in range(li_n)],
        "l_suppkey": [(i % 6) + 1 for i in range(li_n)],
        "l_linenumber": [i // n_ord + 1 for i in range(li_n)],
        "l_quantity": [(1.0, 2.0)[i % 2] for i in range(li_n)],
        "l_extendedprice": [(100.25, 200.5)[i % 2] for i in range(li_n)],
        "l_discount": [(0.0, 0.0625)[i % 2] for i in range(li_n)],
        "l_tax": [0.03125] * li_n,
        "l_returnflag": [("R", "A", "N")[i % 3] for i in range(li_n)],
        "l_linestatus": [("O", "F")[i % 2] for i in range(li_n)],
        "l_shipdate": [ts3[i % 3] for i in range(li_n)],
    })

    ev_n = 30
    ts4 = [_ts(1, 9, 0), _ts(1, 9, 10), _ts(1, 9, 20), _ts(1, 11, 0)]
    _write(out_dir, "events", pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]), {
        "event_id": list(range(1, ev_n + 1)),
        # only 4 distinct timestamps: ties WITHIN users and across them
        "ts": [ts4[i % 4] for i in range(ev_n)],
        "user_id": [(7, 8, 9)[i % 3] for i in range(ev_n)],
        "event_type": [("view", "click", "purchase")[i % 3] for i in range(ev_n)],
        "value": [(1.0, 2.0)[i % 2] for i in range(ev_n)],
        "props": ['{"k":%d}' % (i % 2) for i in range(ev_n)],
    })

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma delta",
        "epsilon zeta eta theta",
        "epsilon zeta eta theta",
        "iota kappa lambda mu nu",
        "iota kappa lambda mu nu",
        "omicron pi rho sigma tau",
        "omicron pi rho sigma tau",
    ]
    _write(out_dir, "documents", pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]), {
        "doc_id": list(range(1, 9)),
        "text": texts,
        "lang": ["en"] * 8,
        "source": [("web", "books")[i % 2] for i in range(8)],
        "n_chars": [len(t) for t in texts],  # tied lengths
    })

    # duplicate vectors: tied cosine similarities at every top-k boundary
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.5, 0.5, 0.0, 0.0],
        [0.5, 0.5, 0.0, 0.0],
        [0.25, 0.25, 0.25, 0.25],
        [0.25, 0.25, 0.25, 0.25],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 1.0],
    ]
    _write(out_dir, "embeddings", pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]), {
        "vec_id": list(range(8)),
        "embedding": vecs,
        "label": [(0, 1)[i % 2] for i in range(8)],
    })

    return out_dir


def write_specials_corpus(out_dir: str) -> str:
    """The tie corpus with NaN/±Infinity injected into every double
    column (prices, measures, embedding components) and no NULLs.

    Contract exercised: the ENGINE must not abort — ANSI CAST_OVERFLOW on
    double->integral narrowing and Spark ML's "Vector values MUST NOT be
    NaN or Infinity" are the measured hazards (r13 sweep: q37, n28, n37,
    n38, n03c, d02). Exact oracle parity is OUT of contract on this
    corpus: DuckDB itself cannot CAST non-finite doubles to integers and
    its STDDEV raises "out of range" on Infinity, so several oracles are
    uncomputable — the CI net asserts Spark-side no-crash only."""
    os.makedirs(out_dir, exist_ok=True)
    write_tie_corpus(out_dir)
    nan, inf = float("nan"), float("inf")

    n_ord = 24
    ts3 = [_ts(1, 10), _ts(15, 10), _ts(30, 10)]
    _write(out_dir, "orders", pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ]), {
        "o_orderkey": list(range(1, n_ord + 1)),
        "o_custkey": [(i % 12) + 1 for i in range(n_ord)],
        "o_orderstatus": [("O", "F")[i % 2] for i in range(n_ord)],
        "o_totalprice": [(1000.25, nan, inf, -inf, 2000.5, 3000.75)[i % 6]
                         for i in range(n_ord)],
        "o_orderdate": [ts3[i % 3] for i in range(n_ord)],
        "o_orderpriority": [("1-URGENT", "3-MEDIUM", "5-LOW")[i % 3]
                            for i in range(n_ord)],
    })

    li_n = 40
    _write(out_dir, "lineitem", pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]), {
        "l_orderkey": [(i % n_ord) + 1 for i in range(li_n)],
        "l_partkey": [(i % 10) + 1 for i in range(li_n)],
        "l_suppkey": [(i % 6) + 1 for i in range(li_n)],
        "l_linenumber": [i // n_ord + 1 for i in range(li_n)],
        "l_quantity": [(1.0, 2.0, nan, 3.0)[i % 4] for i in range(li_n)],
        "l_extendedprice": [(100.25, 200.5, inf, 300.75)[i % 4] for i in range(li_n)],
        "l_discount": [(0.0, 0.0625, nan)[i % 3] for i in range(li_n)],
        "l_tax": [0.03125] * li_n,
        "l_returnflag": [("R", "A", "N")[i % 3] for i in range(li_n)],
        "l_linestatus": [("O", "F")[i % 2] for i in range(li_n)],
        "l_shipdate": [ts3[i % 3] for i in range(li_n)],
    })

    ev_n = 30
    ts4 = [_ts(1, 9, 0), _ts(1, 9, 10), _ts(1, 9, 20), _ts(1, 11, 0)]
    _write(out_dir, "events", pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]), {
        "event_id": list(range(1, ev_n + 1)),
        "ts": [ts4[i % 4] for i in range(ev_n)],
        "user_id": [(7, 8, 9)[i % 3] for i in range(ev_n)],
        "event_type": [("view", "click", "purchase")[i % 3] for i in range(ev_n)],
        "value": [(1.0, nan, 2.0, inf, -inf)[i % 5] for i in range(ev_n)],
        "props": ['{"k":%d}' % (i % 2) for i in range(ev_n)],
    })

    _write(out_dir, "customer", pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]), {
        "c_custkey": list(range(1, 13)),
        "c_name": [f"Customer#{i % 3:03d}" for i in range(1, 13)],
        "c_nationkey": [(0, 1, 2)[i % 3] for i in range(12)],
        "c_acctbal": [(10.5, nan, 20.25, inf)[i % 4] for i in range(12)],
        "c_mktsegment": [("BUILDING", "MACHINERY")[i % 2] for i in range(12)],
    })

    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.5, nan, 0.0, 0.0],
        [0.5, 0.5, 0.0, 0.0],
        [inf, 0.25, 0.25, 0.25],
        [0.25, 0.25, 0.25, 0.25],
        [0.0, 1.0, 0.0, 0.0],
        [-inf, 1.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 1.0],
    ]
    _write(out_dir, "embeddings", pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]), {
        "vec_id": list(range(8)),
        "embedding": vecs,
        "label": [(0, 1)[i % 2] for i in range(8)],
    })

    return out_dir


def write_dirty_corpus(out_dir: str) -> str:
    """The weird-corpus shape with DIRTY STRINGS and no NULLs: malformed
    / non-object / wrongly-typed JSON in ``events.props``, regex
    metacharacters, quotes, backslashes, newlines, tabs and leading/
    trailing whitespace in every free-text column. Exercises the JSON
    family (Spark's get_json_object/from_json return NULL where DuckDB's
    json functions RAISE — oracles pin via TRY_CAST(... AS JSON) +
    json_type guards), the regexp family (metacharacters in the DATA,
    not the pattern), tokenizers and hash/digest paths."""
    os.makedirs(out_dir, exist_ok=True)
    write_tie_corpus(out_dir)

    dirty_names = [
        'O\'Brien "Quoted" & Co.',
        "back\\slash\\co",
        "comma, semicolon; pipe|name",
        "line\nbreak name",
        "tab\tseparated name",
        "  leading and trailing  ",
        "regex .* meta [chars] (name)? {x}",
        "$dollar ^caret +plus",
        "unicode köln variant",
        "plain name",
        "<html>&amp;</html>",
        "percent % underscore _ name",
    ]
    _write(out_dir, "customer", pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]), {
        "c_custkey": list(range(1, 13)),
        "c_name": dirty_names,
        "c_nationkey": [(0, 1, 2)[i % 3] for i in range(12)],
        "c_acctbal": [10.25 + 1.5 * i for i in range(12)],
        "c_mktsegment": [("BUILDING", "MACHINERY")[i % 2] for i in range(12)],
    })

    props = [
        '{"k": 7, "tag": "t0"}',       # clean
        "{bad",                         # malformed
        "",                             # empty string
        "[1,2]",                        # non-object
        '{"k": "x"}',                   # string-typed k
        '{"k": 2.9}',                   # float-typed k
        '{"k": null}',                  # JSON-null k
        "123",                          # bare scalar
        '{"k": {"n": 1}}',              # object-typed k
        '{"k": true}',                  # boolean k
        '{"k": 3000000000}',            # int32 overflow
        '{"tag": "no k here"}',         # missing key
        '{"k": -5}',                    # negative int
        "null",                         # JSON null document
        '  {"k": 9}  ',                 # whitespace-padded
        '{"k": "7"}',                   # STRING-typed integer: k_path=7,
                                        # k_struct=NULL (the two Spark
                                        # access paths coerce differently)
        '{"k": " +12 "}',               # padded signed string integer
        '{"k": "\\t7"}',                # tab-padded string integer: Spark
                                        # try_cast trims ALL chars <= 0x20
        '{"k": "8\\n"}',                # trailing-newline string integer
        '{"k": "\\u00019"}',            # \x01-padded: still <= 0x20, so
                                        # Spark yields 9 (ADVICE r13)
        '{"k": "\\u007f7"}',            # \x7f/DEL-padded: UTF8String
                                        # trimAll strips <= 0x20 PLUS DEL,
                                        # so Spark try_cast yields 7; the
                                        # oracle's class must include \x7f
                                        # (ADVICE r15, r15 byte fuzzer)
    ]
    ev_n = 30
    ts4 = [_ts(1, 9, 0), _ts(1, 9, 10), _ts(1, 9, 20), _ts(1, 11, 0)]
    _write(out_dir, "events", pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]), {
        "event_id": list(range(1, ev_n + 1)),
        "ts": [ts4[i % 4] for i in range(ev_n)],
        "user_id": [(7, 8, 9)[i % 3] for i in range(ev_n)],
        "event_type": [("view", "click", "purchase")[i % 3] for i in range(ev_n)],
        "value": [1.25 + 0.5 * i for i in range(ev_n)],
        "props": [props[i % len(props)] for i in range(ev_n)],
    })

    texts = [
        "the quick (brown) fox [jumps] {over} the lazy dog",
        "regex meta .* .+ a|b c?d e{2,3} \\d \\s \\w in plain text",
        'quotes "double" and \'single\' and `backtick`',
        "back\\slash\\\\double and tab\there and\nnewline there",
        "  leading whitespace and trailing  ",
        "numbers 123 456 and longwords abcdefghijklmnop qrstuvwxyzabcdef",
        "dollar $5.99 percent 100% caret ^top$ anchors",
        "html <b>bold</b> &amp; entities &#x27;",
        "a+b=c a*b=d a/b=e a-b=f",
        "windows path C:\\Users\\name and unix /usr/local/bin",
    ]
    _write(out_dir, "documents", pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]), {
        "doc_id": list(range(1, 11)),
        "text": texts,
        "lang": ["en"] * 10,
        "source": [("web", "books")[i % 2] for i in range(10)],
        "n_chars": [len(t) for t in texts],
    })

    _write(out_dir, "part", pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ]), {
        "p_partkey": list(range(1, 11)),
        "p_name": dirty_names[:10],
        "p_brand": [("Brand#11", "Brand#12")[i % 2] for i in range(10)],
        "p_type": [("SMALL PLATED", "LARGE BRUSHED")[i % 2] for i in range(10)],
        "p_size": [3 + i for i in range(10)],
        "p_retailprice": [900.25 + 2.5 * i for i in range(10)],
    })

    return out_dir


def write_empty_corpus(out_dir: str) -> str:
    """All ten tables with their exact physical schemas and ZERO rows.

    Global aggregates still emit a row on empty input (COUNT 0, SUM
    NULL), grouping-sets engines disagree about the () grand-total row
    (Spark: none; DuckDB: one — the q19-family oracles pin Spark's
    reading with HAVING COUNT(*) > 0), and Spark ML fit() aborts on a
    rowless dataset — all measured r13 on this corpus."""
    os.makedirs(out_dir, exist_ok=True)
    write_corpus(out_dir)
    for name in os.listdir(out_dir):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(out_dir, name)
        schema = pq.read_schema(path)
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}, schema=schema),
            path,
        )
    return out_dir


def write_fuzz_corpus(out_dir: str, seed: int) -> str:
    """Seeded-random corpus (VERDICT r14 #4, relational axis): same ten
    physical schemas, but row counts, NULL placement, FK dangling, value
    draws, text shapes and vector contents are all drawn from a
    deterministic RNG — so each round's seed sweeps table shapes nobody
    hand-designed, under the same exactness disciplines as the hand
    corpora:

    * floats are pairwise-DISTINCT binary fractions (ORDER BY/LIMIT
      determinism + exact IEEE sums in any reduction order);
    * timestamps are pairwise distinct where present;
    * primary keys stay unique and non-NULL;
    * text/enum pools reuse the hand corpora's adversarial atoms.
    """
    import json as _json
    import random

    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    def maybe_null(vals: list, rate: float = 0.15) -> list:
        return [None if rng.random() < rate else v for v in vals]

    # widened value classes (VERDICT r15 #5): the map/struct/JSON/calendar/
    # extended-agg oracle families (q40/q41/q48/q38b/q45, n07) had never
    # seen fuzzed inputs — their consuming columns previously drew from
    # clean enum pools only. The weird-string atoms reach q48's to_json
    # rendering (escaping), q40's map values, and every group-by/order-by
    # that touches event_type / o_orderpriority; both engines order
    # strings by raw UTF-8 bytes so the draws stay hash-deterministic.
    weird_atoms = [
        'O\'Brien "Quoted" & Co.',
        "back\\slash",
        "line\nbreak",
        "tab\there",
        "  padded  ",
        "unicode köln",
        "emoji \U0001f998 tail",  # non-BMP: surrogate-pair JSON escapes
        "<html>&amp;</html>",
        "",
        "ctrl\x01char",
        "del\x7fchar",
    ]

    def enum_or_weird(pool: list, weird_rate: float = 0.25) -> str:
        if rng.random() < weird_rate:
            return rng.choice(weird_atoms)
        return rng.choice(pool)

    def fuzz_json() -> str:
        """events.props draw: clean / malformed / every JSON type for k,
        including string-typed k padded with Spark's trimAll class
        (<=0x20 + DEL) — the q41/n07 coercion surface."""
        r = rng.random()
        if r < 0.30:  # clean, the hand-corpus shape
            return '{"k":%d,"tag":"t%d"}' % (rng.randint(0, 30), rng.randint(0, 3))
        if r < 0.42:  # malformed / non-object documents
            return rng.choice(
                ["{bad", "", "[1,2]", "123", "null", '{"k":', "  ", "true",
                 '{"k" 1}', "{}"]
            )
        kind = rng.randrange(6)
        if kind == 0:  # integer k: int32 overflow, 2^53 neighborhood, big
            return '{"k": %d}' % rng.choice(
                [3000000000, -3000000000, 2147483647, -2147483648,
                 9007199254740993, rng.randint(-10**18, 10**18),
                 rng.randint(-40, 40)]
            )
        if kind == 1:  # non-integer-typed k
            return '{"k": %s}' % rng.choice(
                ["2.9", "-0.5", "1e3", "0.0", "true", "false", "null",
                 '{"n": 1}', "[1]"]
            )
        if kind == 2:  # string-typed k: numeric cores under trimAll padding
            pad_l = rng.choice(["", " ", "\t", "\n", "\x01", "\x7f", "\x0b"])
            pad_r = rng.choice(["", " ", "\t", "\x7f"])
            core = rng.choice(["7", "+12", "-3", "007", "x", "2.9", "", "1e2"])
            return _json.dumps({"k": pad_l + core + pad_r})
        if kind == 3:  # weird string k / extra keys
            return _json.dumps(
                {"k": rng.choice(weird_atoms), "tag": rng.choice(weird_atoms)}
            )
        if kind == 4:  # whitespace-padded document, clean payload
            return "  " + _json.dumps({"k": rng.randint(0, 9)}) + " "
        return _json.dumps({"tag": "no k", "other": rng.randint(0, 5)})

    def distinct_fracs(n: int, lo: int, hi: int, q: int = 64) -> list:
        """n pairwise-distinct multiples of 1/q in [lo, hi)."""
        return [k / q for k in rng.sample(range(lo * q, hi * q), n)]

    def fk_pool(keys: list, n: int, dangling: int) -> list:
        pool = list(keys) + [dangling]
        return maybe_null([rng.choice(pool) for _ in range(n)], 0.1)

    n_region = rng.randint(3, 6)
    _write(out_dir, "region", pa.schema([
        ("r_regionkey", pa.int32()), ("r_name", pa.string()),
    ]), {
        "r_regionkey": list(range(n_region)),
        "r_name": maybe_null(
            rng.sample(["AMERICA", "ASIA", "EUROPE", "AFRICA", "MIDDLE EAST",
                        ""], n_region), 0.2),
    })

    n_nation = rng.randint(5, 9)
    _write(out_dir, "nation", pa.schema([
        ("n_nationkey", pa.int32()), ("n_name", pa.string()),
        ("n_regionkey", pa.int32()),
    ]), {
        "n_nationkey": list(range(n_nation)),
        "n_name": maybe_null(rng.sample(
            ["BRAZIL", "CANADA", "FRANCE", "JAPAN", "KENYA", "PERU",
             "CÔTE D'IVOIRE", "ÅLAND", ""], n_nation), 0.15),
        "n_regionkey": fk_pool(list(range(n_region)), n_nation, 99),
    })

    n_cust = rng.randint(10, 18)
    _write(out_dir, "customer", pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]), {
        "c_custkey": list(range(1, n_cust + 1)),
        "c_name": maybe_null([f"Customer#{i:03d}" for i in range(1, n_cust + 1)]),
        "c_nationkey": fk_pool(list(range(n_nation)), n_cust, 98),
        "c_acctbal": maybe_null(distinct_fracs(n_cust, -20, 200)),
        "c_mktsegment": maybe_null([rng.choice(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
            for _ in range(n_cust)]),
    })

    n_supp = rng.randint(5, 9)
    _write(out_dir, "supplier", pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
    ]), {
        "s_suppkey": list(range(1, n_supp + 1)),
        "s_name": maybe_null([f"Supplier#{i:03d}" for i in range(1, n_supp + 1)]),
        "s_nationkey": fk_pool(list(range(n_nation)), n_supp, 99),
        "s_acctbal": maybe_null(distinct_fracs(n_supp, -50, 600)),
    })

    n_part = rng.randint(10, 16)
    adjectives = ["azure", "burnished", "dim", "forest", "green", "hot",
                  "ivory", "jade", "khaki", "lime", "misty", "pale",
                  "rosy", "slow", "tan", "wheat"]
    _write(out_dir, "part", pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ]), {
        "p_partkey": list(range(1, n_part + 1)),
        "p_name": maybe_null([f"{a} steel box" for a in
                              rng.sample(adjectives, n_part)]),
        "p_brand": maybe_null([f"Brand#{rng.randint(11, 15)}"
                               for _ in range(n_part)]),
        "p_type": maybe_null([rng.choice(
            ["SMALL PLATED", "LARGE BRUSHED", "MEDIUM ANODIZED",
             "SMALL POLISHED", "LARGE POLISHED", "SMALL BRUSHED"])
            for _ in range(n_part)]),
        "p_size": maybe_null([rng.randint(0, 50) for _ in range(n_part)]),
        "p_retailprice": maybe_null(distinct_fracs(n_part, 900, 1000)),
    })

    n_ord = rng.randint(20, 34)
    # distinct order dates (r16 calendar fuzz, VERDICT r15 #5): ~2/3 stay
    # in the hand corpora's 2024 neighborhood, ~1/3 sample the wide
    # proleptic-Gregorian range 1700-2260 (capped inside pandas' ns
    # Timestamp range so toPandas round-trips; both engines are proleptic
    # Gregorian so 1700+ draws also dodge the 1582 cutover) — leap days,
    # month ends and century boundaries reach q38b's add_months /
    # quarter / date_trunc arithmetic. Distinctness: sampled ordinals.
    from datetime import date as _date, datetime as _dt

    wide_lo = _date(1700, 1, 1).toordinal()
    wide_hi = _date(2260, 12, 31).toordinal()
    n_wide = n_ord // 3
    ords = [
        _date(2024, 1, 1).toordinal() + d for d in rng.sample(range(1, 90), n_ord - n_wide)
    ] + rng.sample(range(wide_lo, wide_hi), n_wide)
    # nudge some wide draws onto calendar edges (Feb 29, Dec 31, month ends)
    edge_days = [
        _date(2000, 2, 29), _date(1900, 12, 31), _date(2100, 1, 31),
        _date(1999, 12, 31), _date(2024, 2, 29), _date(1752, 9, 30),
    ]
    for i in range(min(len(edge_days), n_wide)):
        ords[n_ord - 1 - i] = edge_days[i].toordinal()
    ords = list(dict.fromkeys(ords))  # dedupe, keep order
    while len(ords) < n_ord:  # refill any collisions, staying distinct
        c = rng.randrange(wide_lo, wide_hi)
        if c not in ords:
            ords.append(c)
    odates = [_dt.fromordinal(o) for o in ords]
    _write(out_dir, "orders", pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ]), {
        "o_orderkey": list(range(1, n_ord + 1)),
        "o_custkey": fk_pool(list(range(1, n_cust + 1)), n_ord, 999),
        "o_orderstatus": maybe_null([rng.choice(["O", "F", "P"])
                                     for _ in range(n_ord)]),
        "o_totalprice": maybe_null(distinct_fracs(n_ord, 1000, 1100)),
        "o_orderdate": maybe_null(odates, 0.1),
        "o_orderpriority": maybe_null([enum_or_weird(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
            for _ in range(n_ord)]),
    })

    n_li = rng.randint(40, 70)
    sdays = rng.sample(range(1, 160), n_li)
    _write(out_dir, "lineitem", pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]), {
        "l_orderkey": fk_pool(list(range(1, n_ord + 1)), n_li, 777),
        "l_partkey": fk_pool(list(range(1, n_part + 1)), n_li, 555),
        "l_suppkey": fk_pool(list(range(1, n_supp + 1)), n_li, 444),
        # r16 (VERDICT r15 #5): negative/large line numbers reach q45's
        # bit_and/bit_or/bit_xor two's-complement reductions; negative
        # and fractional quantities give bool_and(l_quantity > 0) and
        # median interpolation real work
        "l_linenumber": [rng.choice(
            [rng.randint(-5, 8), 2147483647, -2147483648, 0]
            if rng.random() < 0.2 else [rng.randint(1, 4)])
            for _ in range(n_li)],
        "l_quantity": maybe_null(
            [float(rng.randint(-50, 50)) + rng.choice([0.0, 0.25, 0.5])
             for _ in range(n_li)], 0.1),
        "l_extendedprice": maybe_null(distinct_fracs(n_li, 100, 1000), 0.1),
        "l_discount": maybe_null([rng.randint(0, 3) / 16 for _ in range(n_li)], 0.2),
        "l_tax": maybe_null([rng.randint(0, 3) / 32 for _ in range(n_li)], 0.2),
        "l_returnflag": maybe_null([rng.choice(["R", "A", "N"])
                                    for _ in range(n_li)]),
        "l_linestatus": maybe_null([rng.choice(["O", "F"])
                                    for _ in range(n_li)]),
        "l_shipdate": maybe_null([_ts(1 + d // 2, d % 2) for d in sdays], 0.1),
    })

    n_ev = rng.randint(25, 45)
    # distinct timestamps by construction: sampled (day, hour, minute)
    # triples over a grid large enough to sample without replacement
    slots = rng.sample(range(5 * 24 * 60), n_ev)
    _write(out_dir, "events", pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]), {
        "event_id": list(range(1, n_ev + 1)),
        "ts": maybe_null([_ts(1 + s // (24 * 60), (s // 60) % 24, s % 60)
                          for s in slots], 0.1),
        "user_id": maybe_null([rng.randint(7, 12) for _ in range(n_ev)]),
        # r16 (VERDICT r15 #5): weird-atom event types reach q40's map
        # values and every event_type group-by; fuzz_json() sweeps the
        # q41/n07 JSON coercion surface with typed/malformed/padded k
        "event_type": maybe_null([enum_or_weird(["view", "click", "purchase"])
                                  for _ in range(n_ev)]),
        "value": maybe_null(distinct_fracs(n_ev, 0, 40)),
        "props": maybe_null([fuzz_json() for _ in range(n_ev)]),
    })

    # documents: random token soup with deliberate exact dups, near-dups
    # (one token swapped), whitespace chaos and unicode
    words = ["the", "quick", "brown", "fox", "data", "shuffle", "spark",
             "jumps", "dog", "étude", "naïve", "TOKEN", "a", "zz9"]
    n_doc = rng.randint(9, 15)
    texts: list = []
    for _ in range(n_doc):
        r = rng.random()
        if r < 0.12 and texts:
            texts.append(rng.choice([t for t in texts if t] or ["x"]))  # exact dup
        elif r < 0.2:
            texts.append(rng.choice(["", None, "single"]))
        else:
            k = rng.randint(3, 14)
            toks = [rng.choice(words) for _ in range(k)]
            sep = rng.choice([" ", "  ", " \t "])
            texts.append(sep.join(toks))
    _write(out_dir, "documents", pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]), {
        "doc_id": list(range(1, n_doc + 1)),
        "text": texts,
        "lang": maybe_null([rng.choice(["en", "de", "xx"]) for _ in range(n_doc)]),
        "source": maybe_null([rng.choice(["web", "books", "code"])
                              for _ in range(n_doc)]),
        "n_chars": [len(t) if t is not None else None for t in texts],
    })

    # embeddings: components are multiples of 1/8 (exact float32 dots);
    # always one zero vector and one NULL (the norm/NULL guards)
    n_vec = rng.randint(8, 14)
    vecs: list = [[0.0, 0.0, 0.0, 0.0], None]
    for _ in range(n_vec - 2):
        vecs.append([rng.randint(-8, 8) / 8 for _ in range(4)])
    rng.shuffle(vecs)
    _write(out_dir, "embeddings", pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]), {
        "vec_id": list(range(n_vec)),
        "embedding": vecs,
        "label": maybe_null([rng.randint(0, 2) for _ in range(n_vec)]),
    })

    return out_dir


def main() -> int:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--ties" in flags:
        gen, default = write_tie_corpus, "/tmp/tie_corpus"
    elif "--specials" in flags:
        gen, default = write_specials_corpus, "/tmp/specials_corpus"
    elif "--empty" in flags:
        gen, default = write_empty_corpus, "/tmp/empty_corpus"
    elif "--dirty" in flags:
        gen, default = write_dirty_corpus, "/tmp/dirty_corpus"
    elif any(a.startswith("--fuzz") for a in flags):
        fuzz_flag = next(a for a in flags if a.startswith("--fuzz"))
        seed = int(fuzz_flag.split("=", 1)[1]) if "=" in fuzz_flag else 1515
        out = args[0] if args else "/tmp/fuzz_corpus"
        write_fuzz_corpus(out, seed)
        print(f"wrote 10 tables to {out} (write_fuzz_corpus seed={seed})")
        return 0
    else:
        gen, default = write_corpus, "/tmp/weird_corpus"
    out = args[0] if args else default
    gen(out)
    print(f"wrote 10 tables to {out} ({gen.__name__})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
