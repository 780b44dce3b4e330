"""`udal_tpu al` — the production AL loop over TFRecord pools
(apps/al_runner.py; ref entry `python -m active_learning_loop`,
`active_learning_loop.py:994-1165`)."""

import os

import numpy as np
import pytest

from udal_tpu.apps.al_runner import PoolIndex
from udal_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture()
def pool_tfrecord(tmp_path):
    path = str(tmp_path / "pool.tfrecord")
    write_synthetic_dataset(path, num_images=10, height=64, width=96,
                            num_classes=3, seed=0)
    return path


def test_pool_index_roundtrip(pool_tfrecord, tmp_path):
    idx = PoolIndex(pool_tfrecord)
    assert len(idx.names) == 10
    assert len(set(idx.names)) == 10
    # byte-identical subset copies
    sub = str(tmp_path / "sub.tfrecord")
    chosen = idx.names[2:5]
    assert idx.write_subset(chosen, sub) == 3
    sub_idx = PoolIndex(sub)
    assert sub_idx.names == chosen
    for n in chosen:
        assert sub_idx.record(n) == idx.record(n)


def test_pool_index_decode(pool_tfrecord):
    idx = PoolIndex(pool_tfrecord)
    imgs = idx.decoded_images(idx.names[:2])
    assert imgs[0].shape == (64, 96, 3) and imgs[0].dtype == np.uint8


@pytest.mark.slow
def test_cli_al_end_to_end(pool_tfrecord, tmp_path):
    """Two budget iterations through the real CLI: random warm start,
    train, array-native pool scoring, second selection, artifacts."""
    from udal_tpu import cli

    work = str(tmp_path / "al")
    out_tfr = str(tmp_path / "selected.tfrecord")
    cli.main([
        "al", "--pool_file_pattern", pool_tfrecord, "--work_dir", work,
        "--strategy", "entropy", "--budgets", "20,20",
        "--batch_size", "2", "--num_epochs", "1", "--steps_per_epoch", "1",
        "--out_tfrecord", out_tfr,
        "--hparams", ("image_size=64,num_classes=3,fpn_cell_repeats=1,"
                      "box_class_repeats=1,mc_dropout=true,"
                      "mc_dropoutsamp=2"),
    ])
    sel = open(os.path.join(work, "selected.txt")).read().splitlines()
    assert len(sel) == 4 and len(set(sel)) == 4
    for i in range(2):
        it = os.path.join(work, f"iter_{i}")
        assert os.path.exists(os.path.join(it, "selected.txt"))
        assert os.path.exists(os.path.join(it, "train_done"))
        assert os.path.exists(os.path.join(it, "model"))
    # training-ready TFRecord of the final selection
    assert PoolIndex(out_tfr).names == sel
