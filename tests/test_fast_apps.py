"""Fast-input (uint8 / device_resize) reader contracts through the product
apps: `cli inspect` inference/validate/calibrate and the adapter module
(`apps/reader_batches.py`). The eval CLI twin lives in test_cli_and_loop.
"""

import os

import numpy as np
import pytest

from udal_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fastapps") / "val.tfrecord")
    write_synthetic_dataset(p, num_images=8, height=64, width=64,
                            num_classes=7, seed=0)
    return p


HP = "num_classes=8,image_size=64,loss_attenuation=True"


def _run_validate(dataset, out_dir, extra):
    from udal_tpu import cli

    cli.main(["inspect", "--mode", "validate",
              "--model_name", "efficientdet-d0", "--model_dir", "_",
              "--hparams", HP, "--batch_size", "4",
              "--val_file_pattern", dataset,
              "--output_dir", out_dir] + extra)
    with open(os.path.join(out_dir, "validate_results.txt")) as f:
        return f.readlines()


@pytest.mark.parametrize("flag", ["--fast_input", "--device_resize"])
def test_inspect_validate_fast_contract(tmp_path, dataset, flag):
    ref = _run_validate(dataset, str(tmp_path / "ref"), [])
    got = _run_validate(dataset, str(tmp_path / "fast"), [flag])
    # same GT set -> same row count; contents differ only by resize rounding
    assert len(got) == len(ref)


def test_inspect_inference_device_resize(tmp_path, dataset):
    from udal_tpu import cli
    from udal_tpu.apps.infer import read_prediction_data

    out_ref = str(tmp_path / "inf_ref")
    out_fast = str(tmp_path / "inf_fast")
    cli.main(["inspect", "--mode", "inference",
              "--model_name", "efficientdet-d0", "--model_dir", "_",
              "--hparams", HP, "--batch_size", "4",
              "--val_file_pattern", dataset, "--output_dir", out_ref])
    cli.main(["inspect", "--mode", "inference",
              "--model_name", "efficientdet-d0", "--model_dir", "_",
              "--hparams", HP, "--batch_size", "4",
              "--val_file_pattern", dataset, "--output_dir", out_fast,
              "--device_resize"])
    ref = read_prediction_data(os.path.join(out_ref, "prediction_data.txt"))
    got = read_prediction_data(os.path.join(out_fast, "prediction_data.txt"))
    # per-image detection counts match up to resize-rounding border flips
    names = {r["image_name"] for r in ref}
    assert names == {r["image_name"] for r in got}
    n_ref = len(ref)
    assert abs(len(got) - n_ref) <= max(2, n_ref // 4)


def test_inspect_calibrate_device_resize(tmp_path, dataset):
    from udal_tpu import cli

    out = str(tmp_path / "calib")
    cli.main(["inspect", "--mode", "calibrate",
              "--model_name", "efficientdet-d0", "--model_dir", "_",
              "--hparams", HP, "--batch_size", "4",
              "--val_file_pattern", dataset, "--output_dir", out,
              "--device_resize"])
    assert os.path.isdir(out) and os.listdir(out)


def test_adapter_groundtruth_synthesis():
    from udal_tpu.apps.reader_batches import groundtruth_from_labels

    gb = np.asarray([[[1.0, 2.0, 11.0, 22.0], [0, 0, 0, 0]]], np.float32)
    gc = np.asarray([[3, 0]], np.int32)
    gt = groundtruth_from_labels({"gt_boxes": gb, "gt_classes": gc})
    assert gt.shape == (1, 2, 7)
    np.testing.assert_allclose(gt[0, 0], [1, 2, 11, 22, 0, 200, 3])
    assert gt[0, 1, -1] == 0  # padded row keeps class 0
