"""Representative-dataset INT8 (W8A8) quantization accuracy measurement.

Product analog of the reference's TFLite INT8 post-training quantization
with a representative dataset (`/root/reference/src/infer_lib.py:543-596`):
per-channel int8 weights + per-tensor activation scales calibrated from
representative images, served through the full uncertainty postprocess.
Asserts the quantized path stays close to f32 at the detection level.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _iou(a, b):
    yx1 = np.maximum(a[:2], b[:2])
    yx2 = np.minimum(a[2:], b[2:])
    inter = np.prod(np.maximum(yx2 - yx1, 0.0))
    ar_a = np.prod(np.maximum(a[2:] - a[:2], 0.0))
    ar_b = np.prod(np.maximum(b[2:] - b[:2], 0.0))
    return inter / max(ar_a + ar_b - inter, 1e-9)


def test_int8_serve_close_to_f32(tmp_path):
    from udal_tpu import cli
    from udal_tpu.apps.serving import (ServingDriver,
                                       calibrate_activations_int8,
                                       serve_quantized_int8)
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.synthetic import write_synthetic_dataset

    data = str(tmp_path / "train.tfrecord")
    write_synthetic_dataset(data, num_images=4, height=64, width=64,
                            num_classes=3, seed=1)
    hparams = ("image_size=64,num_classes=4,save_freq=1,"
               "mc_dropout=False,loss_attenuation=True")
    mdir = str(tmp_path / "model")
    cli.main(["train", "--train_file_pattern", data, "--model_dir", mdir,
              "--hparams", hparams, "--batch_size", "2", "--num_epochs", "1",
              "--steps_per_epoch", "3"])

    cfg = get_detection_config("efficientdet-d0")
    cfg.override(hparams, allow_new_keys=True)
    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    _, st, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), 1)
    st, _ = restore_checkpoint(mdir, st)
    variables = swap_in_ema(st)

    rng = np.random.RandomState(0)
    rep = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)
    test_imgs = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)

    act_scales = calibrate_activations_int8(cfg, variables, rep)
    assert len(act_scales) > 50  # every conv/dense input calibrated
    assert all(s > 0 for s in act_scales.values())

    drv = ServingDriver(cfg, variables, batch_size=2)
    d32 = drv.serve_detections(test_imgs)
    d8 = serve_quantized_int8(cfg, variables, act_scales, test_imgs)

    ious, dscore = [], []
    for i in range(2):
        n32 = int(np.asarray(d32.valid_len)[i])
        n8 = int(np.asarray(d8.valid_len)[i])
        if n32 == 0 or n8 == 0:
            continue
        s32 = np.asarray(d32.scores)[i][:n32]
        b32 = np.asarray(d32.boxes)[i][:n32]
        b8 = np.asarray(d8.boxes)[i][:n8]
        s8 = np.asarray(d8.scores)[i][:n8]
        for t in np.argsort(s32)[::-1][:5]:
            m = np.argmax([_iou(b32[t], bb) for bb in b8])
            ious.append(_iou(b32[t], b8[m]))
            dscore.append(abs(float(s32[t]) - float(s8[m])))
    assert ious, "no detections to compare"
    # int8 tolerance is looser than bf16 but must stay detection-compatible
    assert float(np.mean(ious)) > 0.8, (np.mean(ious), ious)
    assert float(np.mean(dscore)) < 0.05, np.mean(dscore)
