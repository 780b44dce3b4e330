import numpy as np

from udal_tpu.train.runner import run_from_ini
from udal_tpu.utils.profiling import LatencyRecorder, device_memory_stats


def test_runner_parses_ini(tmp_path):
    ini = tmp_path / "train_runner.ini"
    ini.write_text("""
[run_a]
model_name = efficientdet-d0
train_file_pattern = data/train*.tfrecord
hparams = num_classes=8
num_epochs = 5

[run_b]
model_name = efficientdet-d1
train_file_pattern = data/other*.tfrecord
batch_size = 16
""")
    argvs = run_from_ini(str(ini), dry_run=True)
    assert len(argvs) == 2
    assert "--hparams" in argvs[0]
    assert argvs[1][argvs[1].index("--batch_size") + 1] == "16"
    only_b = run_from_ini(str(ini), sections=["run_b"], dry_run=True)
    assert len(only_b) == 1


def test_latency_recorder_iqr():
    rec = LatencyRecorder()
    for t in [0.01] * 20 + [5.0]:     # one outlier
        rec.samples.append(t)
    s = rec.summary()
    assert s["n_outliers"] == 1
    assert s["median"] == 0.01


def test_device_memory_stats_runs():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
