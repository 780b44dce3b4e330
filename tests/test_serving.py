import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.apps.serving import ServingDriver, load_exported
from udal_tpu.train.train_lib import TrainState
from udal_tpu.utils.checkpoint import (latest_checkpoint, restore_checkpoint,
                                       save_checkpoint, swap_in_ema)


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


def _driver(**overrides):
    ov = {"image_size": 128, "num_classes": 8}
    ov.update(overrides)
    return ServingDriver.create("efficientdet-d0", overrides=ov, batch_size=2)


def test_serve_deterministic_shapes():
    d = _driver()
    imgs = np.random.RandomState(0).randint(0, 255, (2, 96, 160, 3), np.uint8)
    boxes, scores, classes, valid = d.serve(imgs)
    assert boxes.shape == (2, 100, 4)
    assert scores.shape == (2, 100)
    assert classes.shape == (2, 100)
    assert valid.shape == (2,)
    # boxes are scaled back to original resolution
    assert float(jnp.max(boxes)) <= 165.0


def test_serve_with_uncertainty_packing():
    d = _driver(loss_attenuation=True, mc_dropout=True, mc_dropoutrate=0.1,
                mc_dropoutsamp=3, enable_softmax=True, is_training_bn=False)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 96, 160, 3), np.uint8)
    out = d.serve(imgs)
    boxes, scores, classes, valid, logits = out
    # boxes ⊕ sigma_al ⊕ sigma_mc
    assert boxes.shape == (2, 100, 12)
    # class ⊕ sigma_cls
    assert classes.shape == (2, 100, 1 + 8)
    assert logits.shape == (2, 100, 8)


def test_structured_detections():
    d = _driver(loss_attenuation=True)
    imgs = np.zeros((2, 128, 128, 3), np.uint8)
    det = d.serve_detections(imgs)
    assert det.sigma_al is not None and det.sigma_mc is None
    assert det.boxes.shape == (2, 100, 4)


def test_export_and_reload(tmp_path):
    d = _driver()
    path = d.export(str(tmp_path / "export"))
    call = load_exported(path)
    imgs = np.random.RandomState(1).rand(2, 128, 128, 3).astype(np.float32)
    ref = d._serve_fn(d.variables, jnp.asarray(imgs), jax.random.PRNGKey(5))
    out = call(imgs, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    d = _driver()
    state = TrainState(step=jnp.asarray(7), params=d.variables["params"],
                       batch_stats=d.variables["batch_stats"],
                       opt_state=(), ema_params=None)
    model_dir = str(tmp_path / "model")
    save_checkpoint(model_dir, state, epoch=3)
    save_checkpoint(model_dir, state, epoch=5)
    assert latest_checkpoint(model_dir) == 5
    zero_state = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, epoch = restore_checkpoint(model_dir, zero_state)
    assert epoch == 5
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_underscore_is_noop():
    state = TrainState(step=jnp.asarray(0), params={"w": jnp.ones(3)},
                       batch_stats={}, opt_state=(), ema_params=None)
    restored, epoch = restore_checkpoint("_", state)
    assert epoch == 0
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.ones(3))


def test_swap_in_ema():
    state = TrainState(step=jnp.asarray(0), params={"w": jnp.ones(3)},
                       batch_stats={"bn": jnp.zeros(2)}, opt_state=(),
                       ema_params={"w": jnp.full((3,), 2.0)})
    v = swap_in_ema(state)
    np.testing.assert_array_equal(np.asarray(v["params"]["w"]), 2.0 * np.ones(3))


def test_serve_sharded_over_mesh():
    import jax

    from udal_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    d = _driver()
    mesh = make_mesh()
    imgs = np.random.RandomState(0).randint(0, 255, (8, 64, 64, 3), np.uint8)
    boxes, scores, classes, valid = d.serve_sharded(mesh, imgs)
    assert boxes.shape == (8, 100, 4)
    # results match the unsharded path
    ref = d._serve_fn(d.variables, jnp.asarray(imgs),
                      jax.random.PRNGKey(0))
    assert np.asarray(valid).shape == (8,)


def test_video_inference_mode(tmp_path):
    """Inspector mode 4 parity: per-frame video inference with overlays
    (`/root/reference/src/inspector.py:229-306`)."""
    import os

    import cv2

    from udal_tpu.cli import run_video_inference

    video = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 5.0,
                        (160, 96))
    rng = np.random.RandomState(0)
    for _ in range(3):
        w.write(rng.randint(0, 255, (96, 160, 3), np.uint8))
    w.release()

    d = _driver(batch_size=1)
    out_video = str(tmp_path / "out.mp4")
    frames_dir = str(tmp_path / "frames")
    n = run_video_inference(d, video, output_video=out_video,
                            frames_dir=frames_dir, min_score=0.0,
                            max_frames=2)
    assert n == 2
    assert os.path.exists(out_video) and os.path.getsize(out_video) > 0
    assert len(os.listdir(frames_dir)) == 2


def test_int8_weight_quantization_roundtrip():
    """INT8 post-training weight quantization (TFLite-INT8 analogue,
    ref `infer_lib.py:543-596`): quantized serving matches f32 detections
    within tolerance."""
    from udal_tpu.apps.serving import (ServingDriver, dequantize_weights,
                                       quantize_weights_int8)

    d = _driver(loss_attenuation=True)
    q, scales = quantize_weights_int8(d.variables)
    deq = dequantize_weights(q, scales)
    d2 = ServingDriver(d.config, deq, batch_size=2)

    imgs = np.random.RandomState(0).randint(0, 255, (2, 96, 160, 3),
                                            np.uint8)
    det_f = d.serve_detections(imgs)
    det_q = d2.serve_detections(imgs)
    # scores shift slightly under int8 weights; boxes of confident
    # detections stay close
    sf = np.asarray(det_f.scores[0])
    sq = np.asarray(det_q.scores[0])
    assert np.abs(sf[:10] - sq[:10]).max() < 0.2
    # kernels really are int8
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(q)[0]
    kinds = {np.asarray(l).dtype for p, l in leaves
             if (p[-1].key if hasattr(p[-1], "key") else "") == "kernel"}
    assert np.dtype(np.int8) in kinds


@pytest.mark.slow
def test_serve_sample_parallel_matches_unsharded():
    """MC sample-axis sharding (the sequence-parallel analog): sharded and
    unsharded programs agree for the same key."""
    import jax

    from udal_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    d = _driver(mc_dropout=True, mc_dropoutrate=0.1, mc_dropoutsamp=8,
                loss_attenuation=True)
    imgs = np.random.RandomState(1).randint(0, 255, (2, 64, 128, 3), np.uint8)

    mesh = make_mesh(n_data=8)
    d._mc_key = jax.random.PRNGKey(7)
    out_sp = d.serve_sample_parallel(mesh, imgs)

    d._mc_key = jax.random.PRNGKey(7)
    out_ref = d.serve(imgs)

    # T-moment reassociation under sharding perturbs near-tied scores, so
    # detections may permute: compare order-robustly.
    b_sp, s_sp, c_sp, v_sp = [np.asarray(t, np.float32) for t in out_sp[:4]]
    b_rf, s_rf, c_rf, v_rf = [np.asarray(t, np.float32) for t in out_ref[:4]]
    np.testing.assert_array_equal(v_sp, v_rf)
    np.testing.assert_allclose(np.sort(s_sp, axis=1), np.sort(s_rf, axis=1),
                               rtol=1e-3, atol=1e-3)
    for i in range(b_sp.shape[0]):
        n = int(v_sp[i])
        for j in range(n):
            dist = np.abs(b_rf[i, :n, :4] - b_sp[i, j, :4]).max(axis=1)
            assert dist.min() < 0.5, (i, j, dist.min())
