#!/usr/bin/env python3
"""Generate an sf1 fixture tier (~10x sf0.1) for scale evidence.

/root/testdata is read-only and tops out at sf0.1; the r3 verdict asks
for one more order of magnitude of local evidence for the 100-TB design
claims (bucket guards, AQE flip points, CC convergence, gram shuffle
volumes).  This derives sf1 from sf0.1 deterministically — no RNG state
outside fixed seeds, so reruns are bit-identical:

- fact tables are replicated ``factor`` times with DENSE id shifts
  (offset = id-span per replica), keeping every cross-table join
  consistent (orders.o_custkey moves with customer.c_custkey, lineitem
  follows orders/part/supplier) and every per-key invariant intact
  (events keeps (user_id, ts) duplicate-free by shifting user ids);
- ``documents`` replicas REMIX: every other word is replaced by a
  (replica, doc, position)-unique token, which breaks near-duplicate
  structure both ACROSS replicas and WITHIN each replica.  This is
  deliberate: the sf0.1 corpus already holds quadratically-sized clone
  clusters (3.9M organic MinHash candidate pairs), and a naive 10x
  replication decuples every cluster — candidate-pair outputs grow
  ~100x (~400M rows) and the value-comparison harness (driver
  toPandas + DuckDB), not the engine, becomes the bottleneck.  A real
  10x corpus grows clusters ~linearly; the remix models that.  A
  BOUNDED planted near-dup set remains: every 100th doc's replicas
  keep the original text plus a light per-replica suffix (10-doc clone
  clusters joining their organic neighborhoods);
- ``embeddings`` replicas are fresh seeded gaussians (independent
  vectors) except every 100th vec_id, which gets a small perturbation
  of the original (planted ANN/semantic near-dups, cosine ~0.99);
- dimension tables (region, nation) are copied, not replicated — they
  are fixed domains.

Replica 0 is the untouched sf0.1 data, so queries pinning literal ids
(vec_id = 0, the pivot value list, srcK sources) keep their anchors and
the organic dedup structure is preserved exactly once.

Usage:
    python scripts/make_sf1.py [dst] [--src /root/testdata/sf0.1] [--factor 10]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _span(ids) -> int:
    return int(ids.max()) - int(ids.min()) + 1


def _replicate(df, factor, shifts):
    """Concat ``factor`` copies; ``shifts`` maps id column -> the span
    to shift by per replica.  FK columns MUST shift by the REFERENCED
    table's key span (passed in by the caller), never by the fact
    column's own span: when the extreme dimension keys are unreferenced
    (standard TPC-H: ~1/3 of customers have no orders) the two spans
    differ and a fact-side span would point replica k's rows at the
    wrong replica's dimension keys."""
    import pandas as pd

    out = []
    for k in range(factor):
        rep = df.copy()
        for col, span in shifts.items():
            rep[col] = rep[col] + k * span
        out.append(rep)
    return pd.concat(out, ignore_index=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dst", nargs="?", default="/tmp/spark_graft_sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args(argv)
    src, dst, factor = Path(args.src), Path(args.dst), args.factor
    dst.mkdir(parents=True, exist_ok=True)

    def read(name):
        return pq.read_table(src / f"{name}.parquet").to_pandas()

    def write(name, df, schema_like=None):
        table = pa.Table.from_pandas(df, preserve_index=False)
        if schema_like is not None:
            table = table.cast(pq.read_schema(src / f"{schema_like}.parquet"))
        pq.write_table(table, dst / f"{name}.parquet")
        print(f"{name}: {len(df)} rows")

    # fixed dims: copy
    for name in ("region", "nation"):
        write(name, read(name), schema_like=name)

    cust = read("customer")
    cust_span = _span(cust["c_custkey"])
    write("customer", _replicate(cust, factor, {"c_custkey": cust_span}), "customer")
    supp = read("supplier")
    supp_span = _span(supp["s_suppkey"])
    write("supplier", _replicate(supp, factor, {"s_suppkey": supp_span}), "supplier")
    part = read("part")
    part_span = _span(part["p_partkey"])
    write("part", _replicate(part, factor, {"p_partkey": part_span}), "part")
    orders = read("orders")
    ord_span = _span(orders["o_orderkey"])
    write(
        "orders",
        _replicate(
            orders, factor, {"o_orderkey": ord_span, "o_custkey": cust_span}
        ),
        "orders",
    )
    li = read("lineitem")
    write(
        "lineitem",
        _replicate(
            li,
            factor,
            {"l_orderkey": ord_span, "l_partkey": part_span, "l_suppkey": supp_span},
        ),
        "lineitem",
    )
    ev = read("events")
    write(
        "events",
        _replicate(
            ev,
            factor,
            {"event_id": _span(ev["event_id"]), "user_id": _span(ev["user_id"])},
        ),
        "events",
    )

    # documents: remixed replicas + bounded planted near-dups
    import pandas as pd

    docs = read("documents")
    n_span = _span(docs["doc_id"])

    def _remix(text: str, k: int, doc_id: int) -> str:
        words = text.split(" ")
        return " ".join(
            w if i % 2 == 0 else f"x{k}_{doc_id}_{i}"
            for i, w in enumerate(words)
        )

    reps = []
    for k in range(factor):
        rep = docs.copy()
        base_ids = rep["doc_id"].to_numpy()
        rep["doc_id"] = rep["doc_id"] + k * n_span
        if k:
            planted = base_ids % 100 == 0
            remixed = [
                t + f" replica{k}" if p else _remix(t, k, int(d))
                for t, d, p in zip(rep["text"], base_ids, planted)
            ]
            rep["text"] = remixed
        rep["n_chars"] = rep["text"].str.len().astype("int64")
        reps.append(rep)
    write("documents", pd.concat(reps, ignore_index=True), "documents")

    # embeddings: independent gaussians + bounded planted near-dups
    emb = read("embeddings")
    v_span = _span(emb["vec_id"])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    scale = float(np.abs(mat).mean())
    rng = np.random.default_rng(1234)
    reps = []
    for k in range(factor):
        rep = emb.copy()
        base_ids = rep["vec_id"].to_numpy()
        rep["vec_id"] = rep["vec_id"] + k * v_span
        if k:
            fresh = rng.standard_normal(mat.shape) * scale * 1.2533  # E|N| -> mean |x|
            pert = mat + 0.05 * rng.standard_normal(mat.shape) * scale
            planted = (base_ids % 100 == 0)[:, None]
            vecs = np.where(planted, pert, fresh)
        else:
            vecs = mat
        rep["embedding"] = [row.astype(np.float32) for row in vecs]
        reps.append(rep)
    write("embeddings", pd.concat(reps, ignore_index=True), "embeddings")


if __name__ == "__main__":
    main()
