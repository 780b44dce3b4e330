import os

import numpy as np
import pytest

from udal_tpu.data.synthetic import write_synthetic_dataset


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_data")
    train = str(d / "train.tfrecord")
    write_synthetic_dataset(train, num_images=8, height=96, width=128,
                            num_classes=7, seed=0)
    return train


def test_train_loop_end_to_end(tmp_path, dataset):
    """Tiny end-to-end: train 2 epochs on synthetic data, checkpoint,
    resume."""
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.loop import train_and_evaluate
    from udal_tpu.utils.checkpoint import latest_checkpoint

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    cfg.num_epochs = 2
    cfg.override({"batch_size": 4}, allow_new_keys=True)
    reader = InputReader(dataset, is_training=True)
    model_dir = str(tmp_path / "model")
    hist = train_and_evaluate(cfg, reader(cfg, 4), steps_per_epoch=2,
                              model_dir=model_dir, log_fn=lambda s: None)
    assert len(hist["loss"]) == 2
    assert np.isfinite(hist["loss"][-1])
    assert latest_checkpoint(model_dir) == 2
    # resume: bump epochs, continue from ckpt 2
    cfg.num_epochs = 3
    hist2 = train_and_evaluate(cfg, reader(cfg, 4), steps_per_epoch=2,
                               model_dir=model_dir, log_fn=lambda s: None)
    assert len(hist2["loss"]) == 1
    assert latest_checkpoint(model_dir) == 3


def test_steps_per_execution_matches_single_step(tmp_path, dataset):
    """steps_per_execution>1 (scan of k steps per XLA call — reference
    `train_flags.py:173` parity) must train numerically like k single
    steps: same batches, same RNG folding by state.step."""
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.loop import train_and_evaluate

    def run(exec_k, mdir):
        cfg = get_detection_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.num_classes = 8
        cfg.num_epochs = 1
        cfg.override({"batch_size": 2, "steps_per_execution": exec_k},
                     allow_new_keys=True)
        reader = InputReader(dataset, is_training=True, seed=7)
        return train_and_evaluate(cfg, reader(cfg, 2), steps_per_epoch=4,
                                  model_dir=str(tmp_path / mdir),
                                  log_fn=lambda s: None)

    h1 = run(1, "m1")
    h2 = run(2, "m2")
    np.testing.assert_allclose(h1["loss"][-1], h2["loss"][-1],
                               rtol=2e-4, atol=2e-4)
    # odd remainder path: 4 steps = one scan of 3 + one single step
    h3 = run(3, "m3")
    np.testing.assert_allclose(h1["loss"][-1], h3["loss"][-1],
                               rtol=2e-4, atol=2e-4)


def test_cli_eval_runs(tmp_path, dataset, capsys):
    from udal_tpu import cli

    cli.main(["eval", "--model_name", "efficientdet-d0",
              "--model_dir", "_",
              "--hparams", "num_classes=8,image_size=64",
              "--batch_size", "4",
              "--val_file_pattern", dataset])
    out = capsys.readouterr().out
    assert "AP:" in out


def test_cli_eval_fast_input_matches_classic(tmp_path, dataset):
    """--fast_input / --device_resize eval: uint8 reader contract through
    the jitted-normalize (and on-device-resize) serving entries must
    reproduce the classic f32 path's metrics up to resize rounding."""
    from udal_tpu import cli

    base = ["eval", "--model_name", "efficientdet-d0", "--model_dir", "_",
            "--hparams", "num_classes=8,image_size=64",
            "--batch_size", "4", "--val_file_pattern", dataset]
    ref = cli.main(base)
    fast = cli.main(base + ["--fast_input"])
    dev = cli.main(base + ["--device_resize"])
    for got in (fast, dev):
        assert set(got) == set(ref)
        for k in ref:
            assert abs(got[k] - ref[k]) < 0.08, (k, got[k], ref[k])


def test_cli_inspect_validate(tmp_path, dataset):
    from udal_tpu import cli

    out_dir = str(tmp_path / "val_out")
    cli.main(["inspect", "--mode", "validate",
              "--model_name", "efficientdet-d0", "--model_dir", "_",
              "--hparams", "num_classes=8,image_size=64,loss_attenuation=True",
              "--batch_size", "4",
              "--val_file_pattern", dataset,
              "--output_dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "validate_results.txt"))


def test_cli_inspect_calibrate(tmp_path, dataset):
    from udal_tpu import cli

    out_dir = str(tmp_path / "calib")
    cli.main(["inspect", "--mode", "calibrate",
              "--model_name", "efficientdet-d0", "--model_dir", "_",
              "--hparams",
              "num_classes=8,image_size=64,loss_attenuation=True,"
              "enable_softmax=True,nms_configs.score_thresh=1e-6",
              "--batch_size", "4",
              "--val_file_pattern", dataset,
              "--output_dir", out_dir])
    # calibrators written when enough matched pairs were gathered
    assert os.path.isdir(out_dir)


def test_cli_train_one_epoch(tmp_path, dataset):
    from udal_tpu import cli
    from udal_tpu.utils.checkpoint import latest_checkpoint

    model_dir = str(tmp_path / "cli_model")
    cli.main(["train", "--model_name", "efficientdet-d0",
              "--model_dir", model_dir,
              "--hparams", "num_classes=8,image_size=64,mixed_precision=True",
              "--batch_size", "4", "--num_epochs", "1",
              "--train_file_pattern", dataset,
              "--steps_per_epoch", "2"])
    assert latest_checkpoint(model_dir) == 1
    assert os.path.exists(os.path.join(model_dir, "config.yaml"))


def test_train_ssl_cli_stac(tmp_path):
    """`udal_tpu train_ssl` — the train_flags_SSL-equivalent driver:
    labeled+unlabeled batch zip with unlabeled_start split (STAC branch)."""
    from udal_tpu import cli
    from udal_tpu.data.synthetic import write_synthetic_dataset

    lab = str(tmp_path / "lab.tfrecord")
    unl = str(tmp_path / "unl.tfrecord")
    write_synthetic_dataset(lab, num_images=4, height=64, width=96,
                            num_classes=7, seed=0)
    write_synthetic_dataset(unl, num_images=4, height=64, width=96,
                            num_classes=7, seed=1, pseudo_scores=True)
    args = cli.build_parser().parse_args([
        "train_ssl", "--train_file_pattern", lab,
        "--unlabeled_file_pattern", unl,
        "--model_dir", str(tmp_path / "m"),
        "--batch_size", "4", "--steps_per_epoch", "1", "--num_epochs", "1",
        "--ratio", "0.5", "--ssl_method", "stac", "--stac_randaug",
        "--hparams",
        "image_size=128,num_classes=8,fpn_cell_repeats=1,"
        "box_class_repeats=1"])
    args.fn(args)
    import os
    assert os.path.exists(tmp_path / "m" / "config.yaml")
    import yaml
    cfg = yaml.safe_load((tmp_path / "m" / "config.yaml").read_text())
    assert cfg["unlabeled_start"] == 2
    assert cfg["ssl_method"] == "stac"


def test_train_ssl_cli_stac_fast_input(tmp_path):
    """STAC through the fast-input (uint8 + compact gt) contract: both
    streams emit compact labels; the labeled side's missing gt_pseudo is
    -1-filled at the zip (composition key-union merge) and anchor labeling
    runs on-device."""
    from udal_tpu import cli
    from udal_tpu.data.synthetic import write_synthetic_dataset

    lab = str(tmp_path / "lab.tfrecord")
    unl = str(tmp_path / "unl.tfrecord")
    write_synthetic_dataset(lab, num_images=4, height=64, width=96,
                            num_classes=7, seed=0)
    write_synthetic_dataset(unl, num_images=4, height=64, width=96,
                            num_classes=7, seed=1, pseudo_scores=True)
    args = cli.build_parser().parse_args([
        "train_ssl", "--train_file_pattern", lab,
        "--unlabeled_file_pattern", unl,
        "--model_dir", str(tmp_path / "m"),
        "--batch_size", "4", "--steps_per_epoch", "1", "--num_epochs", "1",
        "--ratio", "0.5", "--ssl_method", "stac", "--fast_input",
        "--hparams",
        "image_size=128,num_classes=8,fpn_cell_repeats=1,"
        "box_class_repeats=1"])
    args.fn(args)
    import os
    assert os.path.exists(tmp_path / "m" / "config.yaml")
