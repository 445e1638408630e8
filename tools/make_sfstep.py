#!/usr/bin/env python3
"""Synthesize an order-of-magnitude step-up corpus from driver testdata.

The r8/r11 judge directive asks for a full Verify+check at sf1 "the
moment sf1 testdata ships" — it never shipped (testdata tops out at
sf0.1), so this tool manufactures the step: each FACT table is
replicated K times with its unique keys (and event timestamps) shifted
into disjoint ranges, dimensions are kept as-is (the realistic shape —
fact mass scales, dims don't). Every shift preserves referential
integrity (lineitem.l_orderkey moves exactly with orders.o_orderkey)
and determinism (pure integer offsets, no randomness), so the DuckDB
oracle runs on the same files and the full correctness gate applies
unchanged. Document text / embeddings are replicated verbatim: the
cross-copy duplicates are a FEATURE for the dedup/ANN families (10x the
candidate pairs stresses exactly the capped generators that must hold
at 100 TB).

Usage: python3 tools/make_sfstep.py <src_sf_dir> <dst_dir> [K=10]

ENGINEERING test data only — never committed, never a substitute for
driver-shipped testdata; provenance recorded in SURVEY.md §8.
"""
import os
import sys

import duckdb


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT UNNEST(range({k})) AS i")

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    # dimensions: byte-identical copies
    for dim in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM {t(dim)}) TO '{dst}/{dim}.parquet' (FORMAT PARQUET)")

    # orders + lineitem: o_orderkey shifts by i * OSHIFT in lockstep
    oshift = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM {t('orders')}").fetchone()[0]
    con.execute(f"""
        COPY (SELECT o_orderkey + i * {oshift} AS o_orderkey, o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
              FROM {t('orders')}, copies)
        TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT l_orderkey + i * {oshift} AS l_orderkey, l_partkey,
                     l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                     l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
              FROM {t('lineitem')}, copies)
        TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

    # events: user_id AND event_id shift (10x the co-activity graph);
    # ts shifts by i * (span + 1 day) so the copies occupy disjoint eras
    # (same-hour cells never merge across copies — the <= 20 hub cap
    # keeps its meaning instead of silently emptying the graph)
    eshift, ushift, span_sec = con.execute(f"""
        SELECT MAX(event_id) + 1, MAX(user_id) + 1,
               CAST(date_diff('second', MIN(ts), MAX(ts)) + 86400 AS BIGINT)
        FROM {t('events')}""").fetchone()
    con.execute(f"""
        COPY (SELECT event_id + i * {eshift} AS event_id,
                     ts + to_seconds(i * {span_sec}) AS ts,
                     user_id + i * {ushift} AS user_id,
                     event_type, value, props
              FROM {t('events')}, copies)
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")

    # documents / embeddings: id shift, payloads verbatim
    dshift = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM {t('documents')}").fetchone()[0]
    con.execute(f"""
        COPY (SELECT doc_id + i * {dshift} AS doc_id, text, lang, source, n_chars
              FROM {t('documents')}, copies)
        TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    vshift = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM {t('embeddings')}").fetchone()[0]
    con.execute(f"""
        COPY (SELECT vec_id + i * {vshift} AS vec_id, embedding, label
              FROM {t('embeddings')}, copies)
        TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    print(f"wrote {dst} = {k}x {src} (oshift={oshift}, ushift={ushift}, "
          f"span={span_sec}s, dshift={dshift}, vshift={vshift})")


if __name__ == "__main__":
    main()
