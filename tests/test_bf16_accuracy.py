"""bf16-vs-f32 serving accuracy evidence.

The TPU serving default is bf16 (commit e2bef4f: 65 → 109 fps at the d0 op
point); this quantifies what that costs at the op point semantics
(MC-dropout + loss-attenuation + full uncertainty postprocess): per-box
IoU / score drift between matched detections and the synthetic-val mAP
delta, with asserted tolerances. CPU runs both dtypes explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains a tiny model + two serve compiles


def _iou(a, b):
    yx1 = np.maximum(a[:2], b[:2])
    yx2 = np.minimum(a[2:], b[2:])
    inter = np.prod(np.maximum(yx2 - yx1, 0.0))
    ar_a = np.prod(np.maximum(a[2:] - a[:2], 0.0))
    ar_b = np.prod(np.maximum(b[2:] - b[:2], 0.0))
    return inter / max(ar_a + ar_b - inter, 1e-9)


def test_bf16_serve_matches_f32(tmp_path):
    from udal_tpu import cli
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.data.synthetic import write_synthetic_dataset
    from udal_tpu.eval.coco import COCOEvaluator

    data = str(tmp_path / "train.tfrecord")
    write_synthetic_dataset(data, num_images=6, height=64, width=64,
                            num_classes=3, seed=0)
    hparams = ("image_size=64,num_classes=4,save_freq=1,"
               "mc_dropout=True,mc_dropoutsamp=3,loss_attenuation=True")
    mdir = str(tmp_path / "model")
    cli.main(["train", "--train_file_pattern", data, "--model_dir", mdir,
              "--hparams", hparams, "--batch_size", "2", "--num_epochs", "2",
              "--steps_per_epoch", "3"])

    cfg = get_detection_config("efficientdet-d0")
    cfg.override(hparams, allow_new_keys=True)
    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    _, st, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), 1)
    st, _ = restore_checkpoint(mdir, st)
    variables = swap_in_ema(st)

    drv32 = ServingDriver(cfg, variables, batch_size=2, dtype=jnp.float32,
                          mc_seed=11)
    drv16 = ServingDriver(cfg, variables, batch_size=2, dtype=jnp.bfloat16,
                          mc_seed=11)

    ious, dscore, dcls = [], [], []
    ev32 = COCOEvaluator()
    ev16 = COCOEvaluator()
    img_id = 0
    reader = InputReader(data, is_training=False)
    for images, labels in reader(cfg, 2):
        d32 = drv32.serve_detections(images)
        d16 = drv16.serve_detections(images)
        b = images.shape[0]
        gt = np.asarray(labels["groundtruth_data"]).copy()
        gt[..., :4] *= np.asarray(labels["image_scales"])[:, None, None]
        for ev, det in ((ev32, d32), (ev16, d16)):
            boxes = np.asarray(det.boxes)
            rows = np.stack(
                [np.repeat(np.arange(img_id, img_id + b)[:, None],
                           boxes.shape[1], 1),
                 boxes[..., 1], boxes[..., 0],
                 boxes[..., 3] - boxes[..., 1], boxes[..., 2] - boxes[..., 0],
                 np.asarray(det.scores), np.asarray(det.classes)], axis=-1)
            ev.update_state(gt, rows)
        img_id += b
        for i in range(b):
            n32 = int(np.asarray(d32.valid_len)[i])
            n16 = int(np.asarray(d16.valid_len)[i])
            if n32 == 0 or n16 == 0:
                continue
            s32 = np.asarray(d32.scores)[i][:n32]
            top = np.argsort(s32)[::-1][:5]
            b32 = np.asarray(d32.boxes)[i][:n32]
            b16 = np.asarray(d16.boxes)[i][:n16]
            s16 = np.asarray(d16.scores)[i][:n16]
            c32 = np.asarray(d32.classes)[i][:n32]
            c16 = np.asarray(d16.classes)[i][:n16]
            for t in top:
                m = np.argmax([_iou(b32[t], bb) for bb in b16])
                ious.append(_iou(b32[t], b16[m]))
                dscore.append(abs(float(s32[t]) - float(s16[m])))
                dcls.append(float(c32[t] == c16[m]))

    assert ious, "no detections to compare"
    # bf16 evidence: matched boxes nearly coincide, scores drift marginally,
    # classes agree, and synthetic-val mAP is unchanged within tolerance
    assert float(np.mean(ious)) > 0.90, (np.mean(ious), np.min(ious))
    assert float(np.mean(dscore)) < 0.03, np.mean(dscore)
    assert float(np.mean(dcls)) > 0.9, np.mean(dcls)
    ap32 = ev32.result()["AP"]
    ap16 = ev16.result()["AP"]
    assert abs(ap32 - ap16) < 0.05, (ap32, ap16)
