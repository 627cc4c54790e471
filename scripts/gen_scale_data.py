#!/usr/bin/env python3
"""Seeded ~sf1 synthetic testdata: 10x the sf0.1 tables, written to /tmp
(VERDICT r6 item 6 / r7 item 5 — the >=10x direct scale receipt).

Derivation is REPLICATION with key remapping, not naive duplication —
naive copies would manufacture super-linear work that says nothing
about the plans (every text gaining 9 exact clones multiplies near-dup
pair volume quadratically; every embedding gaining 9 identical twins
floods threshold joins).  Per table:

* lineitem/orders — 10 replicas, orderkey offset per replica (the fact
  grows 10x, order composition preserved).
* customer — 10 replicas, custkey offset; each orders replica
  references its own customer replica, so orders-per-customer stays
  constant (as in real TPC-H sf growth).  supplier/part/nation/region
  stay fixed: per-supplier/part groups get denser, which only makes
  group-bys CHEAPER per row, never super-linear.
* events — 10 replicas, event_id + user_id offsets: disjoint user
  populations per replica, so sessions/windows keep their size and the
  group count scales linearly.
* documents — 10 replicas, doc_id offset, every whitespace token
  suffixed with a per-replica tag: token frequencies and duplicate
  structure are preserved WITHIN a replica (dedup clusters replicate
  linearly) while cross-replica Jaccard is exactly 0 (no manufactured
  near-dup pairs across replicas).
* embeddings — 10 replicas, vec_id offset, per-replica PERMUTATION of
  the dimension order: norms and per-dim marginals preserved, but a
  vector and its permuted clone are uncorrelated, so threshold joins
  see 10 independent populations, not 10x exact twins.

Deterministic: numpy PCG64 seeded per (table, replica).  Usage:

    python3 scripts/gen_scale_data.py [SRC_SF_DIR] [DST_DIR] [FACTOR]

defaults: /root/testdata/sf0.1  /tmp/spark_graft_sf1  10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(dst: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))
    print(f"  {name}: {tbl.num_rows} rows")


def _replicate_with_offsets(
    tbl: pa.Table, factor: int, offsets: dict[str, int]
) -> pa.Table:
    """Concatenate ``factor`` copies; column c gains r*offsets[c] in
    replica r (replica 0 is the original, byte-identical)."""
    parts = [tbl]
    for r in range(1, factor):
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in offsets:
                col = pa.compute.add(col, offsets[name] * r)
            cols[name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def _next_pow10(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    # small dims: verbatim
    for name in ("region", "nation", "supplier", "part"):
        _write(dst, name, _read(src, name))

    cust = _read(src, "customer")
    ck_off = _next_pow10(
        pa.compute.max(cust.column("c_custkey")).as_py()
    )
    _write(
        dst,
        "customer",
        _replicate_with_offsets(cust, factor, {"c_custkey": ck_off}),
    )

    orders = _read(src, "orders")
    ok_off = _next_pow10(
        pa.compute.max(orders.column("o_orderkey")).as_py()
    )
    _write(
        dst,
        "orders",
        _replicate_with_offsets(
            orders, factor, {"o_orderkey": ok_off, "o_custkey": ck_off}
        ),
    )

    li = _read(src, "lineitem")
    _write(
        dst,
        "lineitem",
        _replicate_with_offsets(li, factor, {"l_orderkey": ok_off}),
    )

    ev = _read(src, "events")
    eid_off = _next_pow10(pa.compute.max(ev.column("event_id")).as_py())
    uid_off = _next_pow10(pa.compute.max(ev.column("user_id")).as_py())
    _write(
        dst,
        "events",
        _replicate_with_offsets(
            ev, factor, {"event_id": eid_off, "user_id": uid_off}
        ),
    )

    docs = _read(src, "documents")
    did_off = _next_pow10(pa.compute.max(docs.column("doc_id")).as_py())
    parts = [docs]
    texts0 = docs.column("text").to_pylist()
    for r in range(1, factor):
        tag = f"x{r}"
        texts = [
            None
            if t is None
            else " ".join(tok + tag for tok in t.split(" "))
            for t in texts0
        ]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.compute.add(
                        docs.column("doc_id"), did_off * r
                    ),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": docs.column("lang"),
                    "source": docs.column("source"),
                    "n_chars": pa.array(
                        [None if t is None else len(t) for t in texts],
                        type=pa.int64(),
                    ),
                }
            )
        )
    _write(dst, "documents", pa.concat_tables(parts))

    emb = _read(src, "embeddings")
    vid_off = _next_pow10(pa.compute.max(emb.column("vec_id")).as_py())
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    parts = [emb]
    for r in range(1, factor):
        rng = np.random.default_rng(seed=42_000 + r)
        perm = rng.permutation(dim)
        pv = vecs[:, perm]
        parts.append(
            pa.table(
                {
                    "vec_id": pa.compute.add(
                        emb.column("vec_id"), vid_off * r
                    ),
                    "embedding": pa.array(
                        [row.tolist() for row in pv],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": emb.column("label"),
                }
            )
        )
    _write(dst, "embeddings", pa.concat_tables(parts))
    print(f"wrote {dst} (factor {factor} of {src})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
