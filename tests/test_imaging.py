"""P1-P3 image preprocessing: SHA-256 parity vs the crop and tensor
golden fixtures (page images embedded in the page_input fixture)."""

import base64
import hashlib
import json
import zlib

import numpy as np
import pytest

from ds4sd_docling_tableformer_onnx_spark.core.imaging import (
    prepare_table_tensor,
    resize_page,
    tensorize,
)

from .conftest import RESULTS_DIR, load_json


@pytest.fixture(scope="module")
def fixtures():
    page_path = RESULTS_DIR / "tableformer_page_input_reference.json"
    if not page_path.exists():
        pytest.skip("reference checkout not available")
    pages = {s["image_name"]: s for s in load_json(page_path)["samples"]}
    crops = {
        s["image_name"]: s
        for s in load_json(RESULTS_DIR / "tableformer_table_crops_reference.json")["samples"]
    }
    tensors = {
        (s["image_name"], s["table_index"]): s
        for s in load_json(RESULTS_DIR / "tableformer_image_tensors_reference.json")["samples"]
    }
    cfg = json.loads(
        load_json(RESULTS_DIR / "tableformer_config_fast_hash.json")["canonical_json"]
    )
    norm = cfg["dataset"]["image_normalization"]
    return pages, crops, tensors, norm["mean"], norm["std"]


def _page_image(sample):
    raw = base64.b64decode(sample["image_bytes_base64"])
    return np.frombuffer(raw, dtype=np.uint8).reshape(sample["shape"])


def test_page_resize_and_crop_sha_parity(fixtures):
    pages, crops, _, _, _ = fixtures
    for name, page_sample in pages.items():
        img = _page_image(page_sample)
        resized, scale = resize_page(img, 1024)
        crop_sample = crops[name]
        assert scale == pytest.approx(crop_sample["scale_factor"], abs=0)
        assert resized.shape[0] == crop_sample["resized_height"]
        assert resized.shape[1] == crop_sample["resized_width"]
        for entry in crop_sample["table_crops"]:
            out = prepare_table_tensor(
                img, entry["original_bbox"], [0.5] * 3, [0.2] * 3
            )
            assert out["rounded_bbox"] == entry["rounded_bbox"]
            sha = hashlib.sha256(out["crop"].tobytes()).hexdigest()
            assert sha == entry["crop_image_sha256"], (name, entry["table_index"])


def test_tensorize_sha_parity(fixtures):
    pages, crops, tensors, mean, std = fixtures
    for name, page_sample in pages.items():
        img = _page_image(page_sample)
        for entry in crops[name]["table_crops"]:
            out = prepare_table_tensor(img, entry["original_bbox"], mean, std)
            ts = tensors[(name, entry["table_index"])]
            assert list(out["tensor"].shape) == ts["tensor_shape"]
            want = np.frombuffer(
                zlib.decompress(base64.b64decode(ts["tensor_zlib_base64"])),
                dtype=np.float32,
            ).reshape(ts["tensor_shape"])
            assert np.abs(out["tensor"] - want).max() <= 1e-5
            sha = hashlib.sha256(out["tensor"].tobytes()).hexdigest()
            assert sha == ts["tensor_sha256"]
            assert out["tensor"].min() == pytest.approx(ts["tensor_min"], abs=1e-5)
            assert out["tensor"].mean() == pytest.approx(ts["tensor_mean"], abs=1e-5)


def test_identity_resize_noop():
    img = (np.arange(2 * 3 * 3) % 255).astype(np.uint8).reshape(2, 3, 3)
    resized, scale = resize_page(img, 2)
    assert scale == 1.0
    assert np.array_equal(resized, img)


def test_tensorize_square_crop_skips_resize():
    crop = np.full((448, 448, 3), 128, dtype=np.uint8)
    tensor = tensorize(crop, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    expected = (128 / 255.0 - 0.5) / 0.25
    assert tensor.shape == (1, 3, 448, 448)
    assert tensor.flatten()[0] == pytest.approx(expected, abs=1e-6)
