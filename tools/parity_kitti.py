"""Thin wrapper for the real-data KITTI parity runbook.

Equivalent to `python -m udal_tpu.cli parity_kitti ...`; the logic lives in
`udal_tpu/apps/parity.py` (see its docstring for asset requirements).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udal_tpu.apps import parity  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val-tfrecord", dest="val_tfrecord", required=True)
    ap.add_argument("--tf-checkpoint", dest="tf_checkpoint", required=True)
    ap.add_argument("--hparams", default=parity.DEFAULT_HPARAMS)
    ap.add_argument("--batch", dest="batch_size", type=int, default=8)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--out", default=None)
    parity.run(ap.parse_args())


if __name__ == "__main__":
    main()
