"""Helper to import modules from the read-only reference for parity tests.

The reference (`/root/reference/src`) is TF-based; where its modules import
cleanly under the installed TF we check our JAX implementations against it
numerically. Tests must skip gracefully when a reference import fails.

The stub machinery lives in `udal_tpu.utils.reference_compat` (it is also
the product surface behind the `parity_kitti` runbook).
"""

import sys

import pytest

from udal_tpu.utils.reference_compat import (REF_ROOT, REF_SRC,  # noqa: F401
                                             add_reference_to_path,
                                             stub_reference_deps)


def import_reference(module_name: str):
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        return __import__(module_name, fromlist=["*"])
    except Exception as e:  # noqa: BLE001 - any import failure → skip
        pytest.skip(f"reference module {module_name} unavailable: {e}")
