#!/usr/bin/env python3
"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/ds4sd_docling_tableformer_onnx_spark.zip`` containing the
package (code + embedded fixture pool).  Cluster usage:

    spark-submit \
      --py-files dist/ds4sd_docling_tableformer_onnx_spark.zip \
      jobs/extract_job.py --input <iceberg table> --checkpoint <table>

Everything the executors need (per-turn algebra, payload pool) rides in
the zip; model artifacts (when a real ONNX session is wired in) ship via
``--files`` + per-executor lazy init (operators/neural.py).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "ds4sd_docling_tableformer_onnx_spark"


def main():
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / f"{PKG}.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted((REPO / PKG).rglob("*")):
            if path.is_dir() or "__pycache__" in path.parts:
                continue
            zf.write(path, path.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
