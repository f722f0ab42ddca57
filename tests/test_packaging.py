"""spark-submit packaging: the --py-files zip must be self-contained.

Builds the bundle with scripts/package_pyfiles.py and imports the
engine FROM THE ZIP in a clean subprocess (no repo on sys.path) —
exactly what an executor python worker does — then runs one fixture
extraction to prove the embedded data rides along.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_PROBE = """
import sys
zip_path, = sys.argv[1:]
sys.path.insert(0, zip_path)
# the repo itself must NOT be importable — only the zip
sys.path = [p for p in sys.path if p not in ("", "{repo}")]

from ds4sd_docling_tableformer_onnx_spark.core.pipeline import extract_turn
from ds4sd_docling_tableformer_onnx_spark.sources.fixtures import payload_pool
from ds4sd_docling_tableformer_onnx_spark.operators import (  # noqa: F401
    dedup, detector, multimodal, realmodel, similarity,
)

entry = next(e for e in payload_pool() if e["kind"] == "prediction")
import json
payload = json.loads(entry["text"]); payload.update(json.loads(entry["tool"]))
result = extract_turn(payload)
import hashlib
got = hashlib.sha256(json.dumps(result["html_seq"]).encode()).hexdigest()
expect = hashlib.sha256(entry["expected_html_json"].encode()).hexdigest()
assert got == expect, "zip-imported pipeline diverged from fixture"
print("ZIP-OK")
"""


def test_pyfiles_zip_is_self_contained(tmp_path):
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    zip_path = REPO / "dist" / "ds4sd_docling_tableformer_onnx_spark.zip"
    assert zip_path.exists()
    probe = tmp_path / "probe.py"
    probe.write_text(_PROBE.replace("{repo}", str(REPO)))
    out = subprocess.run(
        [sys.executable, str(probe), str(zip_path)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so imports must hit the zip
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "ZIP-OK" in out.stdout
