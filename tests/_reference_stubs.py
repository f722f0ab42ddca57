"""Import the reference's tf_predictor with the ML stack stubbed out.

``tf_predictor`` hard-imports torch / cv2 / torchvision / PIL /
safetensors at module scope, none of which exist in this container.
Only the *deterministic* methods are exercised by the differential
tests (response generation, output merge), so lightweight module stubs
satisfy the imports; no stubbed functionality is ever called.
"""

from __future__ import annotations

import sys
import types

from .conftest import REFERENCE_DIR


class _Anything:
    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self

    def __mro_entries__(self, bases):
        return (object,)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _stub(name, attrs=None, wildcard=False):
    import importlib.machinery

    module = types.ModuleType(name)
    module.__path__ = []
    # pyspark probes importable modules via __spec__; leave a real one
    module.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for attr, value in (attrs or {}).items():
        setattr(module, attr, value)
    if wildcard:  # PEP 562: unknown attributes resolve to a chameleon
        module.__getattr__ = lambda _name: _Anything()
    sys.modules[name] = module
    return module


def load_tf_predictor():
    """Return the reference ``TFPredictor`` class, or None if the
    reference checkout is unavailable."""
    if "docling_ibm_models.tableformer.data_management.tf_predictor" in sys.modules:
        mod = sys.modules[
            "docling_ibm_models.tableformer.data_management.tf_predictor"
        ]
        return mod.TFPredictor

    anything = _Anything()
    torch = _stub(
        "torch",
        {
            "set_num_threads": lambda n: None,
            "is_tensor": lambda x: False,
            "Tensor": object,
        },
        wildcard=True,
    )
    nn = _stub("torch.nn", {"Module": object}, wildcard=True)
    torch.nn = nn
    _stub("torch.nn.functional", {}, wildcard=True)
    _stub(
        "cv2",
        {
            "INTER_AREA": 3, "INTER_NEAREST": 0, "INTER_LINEAR": 1,
            "INTER_CUBIC": 2, "BORDER_CONSTANT": 0, "BORDER_REPLICATE": 1,
            "BORDER_DEFAULT": 4, "BORDER_REFLECT": 2,
            "resize": lambda *a, **k: None, "setNumThreads": lambda n: None,
            "ocl": types.SimpleNamespace(setUseOpenCL=lambda flag: None),
        },
    )
    _stub("torchvision", wildcard=True)
    _stub("torchvision.models", wildcard=True)
    _stub(
        "torchvision.models.resnet",
        {"BasicBlock": object, "conv1x1": lambda *a, **k: None,
         "ResNet": object, "resnet18": lambda *a, **k: None},
    )
    _stub("torchvision.ops")
    _stub("torchvision.ops.boxes", {"box_area": lambda *a, **k: None})
    _stub("torchvision.transforms", {"functional": anything}, wildcard=True)
    _stub("safetensors")
    _stub("safetensors.torch", {"load_model": lambda *a, **k: ([], [])})
    _stub("PIL", {"Image": anything, "ImageDraw": anything, "ImageFont": anything})
    _stub("PIL.Image")

    ref_path = str(REFERENCE_DIR / "tableformer-docling")
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    try:
        from docling_ibm_models.tableformer.data_management.tf_predictor import (
            TFPredictor,
        )
    except Exception:
        return None
    return TFPredictor
