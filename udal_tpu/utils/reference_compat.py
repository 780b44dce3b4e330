"""Read-only interop with the reference implementation's Python modules.

Used by the parity runbook (`apps/parity.py`, CLI `parity_kitti`) and the
parity/interop test tiers: puts the reference source on sys.path and stubs
the pip packages absent from this image (optuna, hebo, imagehash, tfp,
pycocotools, ...) so the reference's *logic* modules import; the code paths
exercised never touch the stubbed deps.
"""

from __future__ import annotations

import os
import sys
import types

REF_ROOT = os.environ.get("UDAL_REFERENCE_ROOT", "/root/reference")
REF_SRC = os.path.join(REF_ROOT, "src")


def reference_available() -> bool:
    return os.path.isdir(REF_SRC)


def add_reference_to_path() -> None:
    for p in (REF_ROOT, REF_SRC):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)


def stub_reference_deps():
    """Inject import stubs for the reference's absent pip dependencies.

    Returns a cleanup callable removing every module this call injected (so
    later `importorskip` probes for the real packages are not fooled).
    """
    injected = []

    def stub(name, is_pkg=False):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        if is_pkg:
            m.__path__ = []
        sys.modules[name] = m
        injected.append(name)
        return m

    for name in ["tensorflow_probability", "optuna", "hebo", "imagehash",
                 "brisque", "albumentations", "neural_structured_learning",
                 "ijson", "tensorflow_hub", "tensorflow_addons"]:
        stub(name)
    stub("uncertainty_toolbox", True)
    stub("uncertainty_toolbox.viz")
    stub("uncertainty_toolbox.metrics_calibration")
    stub("hebo.design_space", True)
    stub("hebo.design_space.design_space").DesignSpace = object
    stub("hebo.optimizers", True)
    stub("hebo.optimizers.hebo").HEBO = object
    stub("pycocotools", True)
    stub("pycocotools.mask")
    stub("pycocotools.coco").COCO = type("COCO", (), {})
    stub("pycocotools.cocoeval").COCOeval = type("COCOeval", (), {})
    stub("object_detection", True)
    stub("object_detection.utils", True)
    stub("object_detection.utils.dataset_util")
    if "tensorflow_probability" in injected:
        sys.modules["tensorflow_probability"].distributions = \
            types.SimpleNamespace()
        sys.modules["tensorflow_probability"].bijectors = \
            types.SimpleNamespace()

    def cleanup():
        for name in injected:
            sys.modules.pop(name, None)

    return cleanup
