#!/usr/bin/env python3
"""Spark-only wall-clock probe for the linear-text heavyweights.

The oracle sweep (scripts/check_oracles.py) times Spark AND DuckDB;
at the sf10 tier the DuckDB side of the gram/CC oracles is the
bottleneck, so scale-law evidence uses this Spark-only harness: run
the named queries at a tier, print one JSON line of walls, and diff
two tiers' outputs into per-query scaling exponents for SCALE.md
(r4 verdict item 6).

Usage:
    python scripts/probe_linear.py SF_DIR [name ...]     # time queries
    python scripts/probe_linear.py --exp A.json B.json RATIO
        # print exponents log(wall_B/wall_A)/log(RATIO)
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT = ["dup_span_stats", "bpe_pair_counts", "bpe_merges", "dedup_groups"]


def exponents(path_a: str, path_b: str, ratio: float) -> dict:
    a, b = json.loads(Path(path_a).read_text()), json.loads(Path(path_b).read_text())
    return {
        name: round(math.log(b[name] / a[name]) / math.log(ratio), 3)
        for name in a
        if name in b
    }


def main(argv):
    if argv and argv[0] == "--exp":
        print(json.dumps(exponents(argv[1], argv[2], float(argv[3]))))
        return 0
    sf_dir, names = argv[0], (argv[1:] or DEFAULT)

    from ds4sd_docling_tableformer_onnx_spark.plans.cache import release
    from ds4sd_docling_tableformer_onnx_spark.queries import QUERIES
    from ds4sd_docling_tableformer_onnx_spark.session import build_session

    spark = build_session(app_name="probe-linear", cores=32, shuffle_partitions=32)
    walls = {}
    for name in names:
        t0 = time.perf_counter()
        frame = QUERIES[name](spark, sf_dir)
        n = frame.count()
        walls[name] = round(time.perf_counter() - t0, 2)
        release(frame)
        print(f"{name}: {walls[name]}s ({n} rows)", file=sys.stderr)
    print(json.dumps(walls))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
