"""`udal_tpu ssl` — production STAC/CSD orchestration
(apps/ssl_runner.py; ref `python -m SSL_stac`, `SSL_stac.py:1118-1197`)."""

import os

import pytest

from udal_tpu.apps.al_runner import PoolIndex
from udal_tpu.data.synthetic import write_synthetic_dataset

TINY = ("image_size=64,num_classes=3,fpn_cell_repeats=1,"
        "box_class_repeats=1,mc_dropout=true,mc_dropoutsamp=2")


@pytest.fixture()
def datasets(tmp_path):
    labeled = str(tmp_path / "labeled.tfrecord")
    unlabeled = str(tmp_path / "unlabeled.tfrecord")
    write_synthetic_dataset(labeled, num_images=6, height=64, width=96,
                            num_classes=3, seed=0)
    write_synthetic_dataset(unlabeled, num_images=6, height=64, width=96,
                            num_classes=3, seed=1)
    return labeled, unlabeled


def test_write_subset_pad_names(tmp_path, datasets):
    labeled, _ = datasets
    idx = PoolIndex(labeled)
    out = str(tmp_path / "padded.tfrecord")
    n = idx.write_subset(idx.names[:5], out, pad_multiple=4)
    assert n == 8
    names = PoolIndex(out).names
    assert names[:5] == idx.names[:5]
    assert all(x.startswith("__pad") for x in names[5:])


@pytest.mark.slow
def test_cli_ssl_stac_end_to_end(tmp_path, datasets):
    """Teacher train -> pool inference -> pseudo TFRecord (reference
    schema) -> student train, through the real CLI."""
    from udal_tpu import cli
    from udal_tpu.data.example_codec import parse_example
    from udal_tpu.data.tfrecord import iterate_tfrecord

    labeled, unlabeled = datasets
    work = str(tmp_path / "ssl")
    cli.main([
        "ssl", "--method", "stac",
        "--train_file_pattern", labeled,
        "--unlabeled_file_pattern", unlabeled,
        "--work_dir", work, "--tau", "0.0", "--pseudoscore",
        "--batch_size", "2", "--num_epochs", "1", "--steps_per_epoch", "1",
        "--hparams", TINY,
    ])
    assert os.path.exists(os.path.join(work, "teacher", "model"))
    assert os.path.exists(os.path.join(work, "student_r0", "model"))
    pseudo = os.path.join(work, "pseudo_round0.tfrecord")
    assert os.path.exists(pseudo)
    recs = list(iterate_tfrecord(pseudo))
    assert recs
    feats = parse_example(recs[0])
    assert feats["image/object/pseudo_score"], "pseudo_score missing"
    assert not feats["image/filename"][0].decode().startswith("__pad")


@pytest.mark.slow
def test_cli_ssl_csd_end_to_end(tmp_path, datasets):
    from udal_tpu import cli

    labeled, unlabeled = datasets
    work = str(tmp_path / "csd")
    cli.main([
        "ssl", "--method", "csd",
        "--train_file_pattern", labeled,
        "--unlabeled_file_pattern", unlabeled,
        "--work_dir", work, "--csd_ramp",
        "--batch_size", "2", "--num_epochs", "1", "--steps_per_epoch", "1",
        "--hparams", TINY,
    ])
    assert os.path.exists(os.path.join(work, "csd", "model"))
