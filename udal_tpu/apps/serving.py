"""Serving driver: one jitted program from raw images to detections.

TPU-native redesign of the reference serving stack
(`/root/reference/src/infer_lib.py:94-616`): KerasDriver/SavedModelDriver
collapse into one `ServingDriver` whose `serve()` is a single XLA program —
preprocess (normalize/resize) → deterministic or vmap'd MC-dropout forward →
fused uncertainty postprocess — instead of per-image Python loops around a
SavedModel. Export uses `jax.export` (StableHLO) as the portable artifact
(the SavedModel/TFLite/TensorRT role).

Benchmark parity: `benchmark()` mirrors `infer_lib.py:206-230` (warmups +
timed runs → latency & FPS) but times a scanned multi-batch program with
fresh PRNG keys per step, which stays valid behind the axon relay (the relay
memoizes repeated identical calls).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from udal_tpu.config import Config, get_detection_config, parse_image_size
from udal_tpu.models.efficientdet import (EfficientDetNet, mc_forward,
                                          preprocess_images)
from udal_tpu.ops.postprocess import Detections, postprocess_global


class ServingDriver:
    """End-to-end detection serving with on-device uncertainty.

    Usage parity with `infer_lib.ServingDriver.create` (`infer_lib.py:154`):
      driver = ServingDriver(config or model_name, variables)
      outputs = driver.serve(uint8_images)   # packed reference contract
    """

    def __init__(self, config: Config, variables: Any,
                 batch_size: int = 1, dtype=None,
                 mc_seed: int = 0, use_pallas_nms: Optional[bool] = None,
                 ensemble: bool = False):
        """With ``ensemble=True``, `variables` is an N-member stacked pytree
        (`models.ensemble.stack_variables`); `serve` runs all members in one
        vmapped program and the postprocess fuses them with the MC-sample
        semantics (mean boxes + epistemic box-variance, class entropy /
        sigma) — BASELINE config #3. See `ServingDriver.create_ensemble`."""
        self.config = config
        self.batch_size = batch_size
        self.ensemble = ensemble
        if ensemble:
            self.num_members = int(jax.tree_util.tree_leaves(
                variables)[0].shape[0])
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if use_pallas_nms is None:
            # the VMEM-resident kernel is the fast path on real TPUs;
            # CPU (tests) and other platforms use the XLA loop
            use_pallas_nms = on_tpu
        if dtype is None:
            # bf16 is the MXU-native serving dtype (65 -> 109 fps at the d0
            # op point); selected candidates are upcast to f32 inside the
            # postprocess. CPU keeps f32 for exactness in tests.
            dtype = jnp.bfloat16 if on_tpu else jnp.float32
        self.use_pallas_nms = use_pallas_nms
        self.model = EfficientDetNet(config, dtype=dtype)
        self.variables = variables
        self._mc_key = jax.random.PRNGKey(mc_seed)
        self._serve_fn = jax.jit(self._serve_impl)
        self._serve_pre_fn = jax.jit(self._serve_pre_impl)
        self._serve_u8_fn = jax.jit(self._serve_u8_impl)
        self._serve_native_fn = jax.jit(self._serve_native_impl)
        self._det_u8_fn = jax.jit(self._det_u8_impl)
        self._det_native_fn = jax.jit(self._det_native_impl)
        # single-slot (mesh, program) cache for serve_sample_parallel: a
        # dict keyed on id(mesh) would pin every mesh + executable forever
        self._sample_parallel_cache = None
        # cached once: a fresh jax.jit wrapper per call would retrace
        self._det_fn = jax.jit(self._det_impl)
        self._det_pre_fn = jax.jit(self._det_pre_impl)

    @classmethod
    def create(cls, model_name: str, variables: Any = None,
               overrides: Optional[Dict] = None, batch_size: int = 1,
               rng: Optional[jax.Array] = None, **kwargs) -> "ServingDriver":
        config = get_detection_config(model_name)
        if overrides:
            config.override(overrides, allow_new_keys=True)
        if variables is None:
            h, w = parse_image_size(config.image_size)
            model = EfficientDetNet(config, dtype=kwargs.get("dtype",
                                                             jnp.float32))
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            p_rng, d_rng = jax.random.split(rng)
            variables = jax.jit(lambda: model.init(
                {"params": p_rng, "dropout": d_rng},
                jnp.zeros((1, h, w, 3)), train=False))()
        return cls(config, variables, batch_size, **kwargs)

    @classmethod
    def create_ensemble(cls, config: Config, member_dirs, batch_size: int = 1,
                        use_ema: bool = True, **kwargs) -> "ServingDriver":
        """Deep-ensemble driver from N member checkpoint directories.

        BASELINE config #3 as a product path: each member's (EMA) weights
        restore from its own orbax model_dir, stack on a leading axis, and
        serve as one vmapped program; fusion (mean boxes, box-variance as
        epistemic sigma, class entropy) reuses the MC-sample reductions
        (reference semantics `/root/reference/src/postprocess.py:326-331`,
        `src/utils_extra.py:220-244` — the reference itself has no ensemble).
        """
        stacked = load_ensemble_variables(config, member_dirs,
                                          use_ema=use_ema)
        return cls(config, stacked, batch_size, ensemble=True, **kwargs)

    # -- core program --------------------------------------------------------

    def _forward(self, variables, images, key):
        cfg = self.config
        if self.ensemble:
            from udal_tpu.models.ensemble import ensemble_forward

            cls_s, box_s = ensemble_forward(self.model, variables, images)
        elif cfg.mc_dropout and (cfg.mc_dropoutrate or cfg.mc_classheadrate or
                                 cfg.mc_boxheadrate):
            cls_s, box_s = mc_forward(self.model, variables, images, key,
                                      cfg.mc_dropoutsamp)
        else:
            cls_s, box_s = self.model.apply(variables, images, train=False)
        # model compute dtype flows into postprocess; candidates are upcast
        # to f32 after selection inside the pipeline
        return list(cls_s), list(box_s)

    def _serve_impl(self, variables, raw_images, key):
        cfg = self.config
        images, scales = preprocess_images(raw_images, cfg.image_size,
                                           cfg.mean_rgb, cfg.stddev_rgb)
        images = images.astype(self.model.dtype)
        cls_s, box_s = self._forward(variables, images, key)
        det = postprocess_global(cfg, cls_s, box_s, image_scales=scales,
                                 use_pallas_nms=self.use_pallas_nms)
        return det.packed()

    def _serve_pre_impl(self, variables, images, scales, key):
        # already normalized+resized (eval InputReader contract): forward +
        # postprocess only; `scales` maps boxes back to the original frame
        cfg = self.config
        images = images.astype(self.model.dtype)
        cls_s, box_s = self._forward(variables, images, key)
        det = postprocess_global(cfg, cls_s, box_s, image_scales=scales,
                                 use_pallas_nms=self.use_pallas_nms)
        return det.packed()

    def _u8_prep(self, images_u8, valid_hw):
        # fast-input device prep, twin of train_lib.prepare_batch: uint8
        # arrives over PCIe (4x less H2D than f32), normalization + padding
        # re-zeroing run fused inside the serving program
        cfg = self.config
        mean = jnp.asarray(cfg.mean_rgb, jnp.float32)
        std = jnp.asarray(cfg.stddev_rgb, jnp.float32)
        x = (images_u8.astype(jnp.float32) - mean) / std
        h, w = x.shape[1], x.shape[2]
        rmask = jnp.arange(h)[None, :] < valid_hw[:, :1]
        cmask = jnp.arange(w)[None, :] < valid_hw[:, 1:]
        return x * (rmask[:, :, None] & cmask[:, None, :])[..., None]

    def _serve_u8_impl(self, variables, images_u8, valid_hw, scales, key):
        return self._serve_pre_impl(
            variables, self._u8_prep(images_u8, valid_hw), scales, key)

    def _det_u8_impl(self, variables, images_u8, valid_hw, scales, key):
        return self._det_pre_impl(
            variables, self._u8_prep(images_u8, valid_hw), scales, key)

    def _det_native_impl(self, variables, images_u8, warp_scale, warp_offset,
                         valid_hw, scales, key):
        x = self._warp(images_u8, warp_scale, warp_offset)
        return self._det_u8_impl(variables, x, valid_hw, scales, key)

    def _warp(self, images_u8, warp_scale, warp_offset):
        # device_resize reader contract: NATIVE-size uint8 in, the bilinear
        # resize itself runs here (ops.image_ops.warp_resize_batch)
        from udal_tpu.config import parse_image_size
        from udal_tpu.ops.image_ops import warp_resize_batch

        return warp_resize_batch(images_u8, warp_scale, warp_offset,
                                 parse_image_size(self.config.image_size))

    def _serve_native_impl(self, variables, images_u8, warp_scale,
                           warp_offset, valid_hw, scales, key):
        x = self._warp(images_u8, warp_scale, warp_offset)
        return self._serve_u8_impl(variables, x, valid_hw, scales, key)

    def _det_pre_impl(self, variables, images, scales, key):
        cfg = self.config
        images = images.astype(self.model.dtype)
        cls_s, box_s = self._forward(variables, images, key)
        return postprocess_global(cfg, cls_s, box_s, image_scales=scales)

    def _det_impl(self, variables, raw_images, key):
        cfg = self.config
        images, scales = preprocess_images(raw_images, cfg.image_size,
                                           cfg.mean_rgb, cfg.stddev_rgb)
        return self._det_pre_impl(variables, images, scales, key)

    def serve(self, raw_images) -> Tuple[jnp.ndarray, ...]:
        """raw uint8/float images [B, H, W, 3] → packed detection tuple
        (boxes⊕sigma_al⊕sigma_mc, scores, classes⊕sigma_cls, valid_len
        [, logits])."""
        self._mc_key, sub = jax.random.split(self._mc_key)
        return self._serve_fn(self.variables, jnp.asarray(raw_images), sub)

    def serve_preprocessed(self, images, image_scales=None
                           ) -> Tuple[jnp.ndarray, ...]:
        """Packed serve of ALREADY normalized+resized images (the eval
        `InputReader` classic-path contract). `serve()` would normalize a
        second time — the reference never feeds its dataloader output to
        its serving driver (`infer_lib.py` reads raw files); batch-fed
        apps here must use this entry with the reader's ``image_scales``
        so boxes land in the original-image frame."""
        images = jnp.asarray(images)
        if image_scales is None:
            image_scales = jnp.ones((images.shape[0],), jnp.float32)
        self._mc_key, sub = jax.random.split(self._mc_key)
        return self._serve_pre_fn(self.variables, images,
                                  jnp.asarray(image_scales, jnp.float32), sub)

    def _dispatch_uint8(self, u8_fn, native_fn, images_u8, valid_hw,
                        image_scales, warp_scale, warp_offset):
        """Shared defaulting + dispatch for the fast-input uint8 entries."""
        from udal_tpu.config import parse_image_size

        images_u8 = jnp.asarray(images_u8)
        b, h, w = images_u8.shape[:3]
        if valid_hw is None:
            # default = everything valid. The mask applies to the
            # NETWORK-size tensor, so with warp params (native-size input)
            # the full extent is the config target, not the native dims.
            vh, vw = parse_image_size(self.config.image_size) \
                if warp_scale is not None else (h, w)
            valid_hw = jnp.full((b, 2), jnp.asarray([vh, vw]), jnp.int32)
        if image_scales is None:
            image_scales = jnp.ones((b,), jnp.float32)
        self._mc_key, sub = jax.random.split(self._mc_key)
        if warp_scale is not None:
            return native_fn(self.variables, images_u8,
                             jnp.asarray(warp_scale, jnp.float32),
                             jnp.asarray(warp_offset, jnp.float32),
                             jnp.asarray(valid_hw, jnp.int32),
                             jnp.asarray(image_scales, jnp.float32), sub)
        return u8_fn(self.variables, images_u8,
                     jnp.asarray(valid_hw, jnp.int32),
                     jnp.asarray(image_scales, jnp.float32), sub)

    def serve_preprocessed_uint8(self, images_u8, valid_hw=None,
                                 image_scales=None, warp_scale=None,
                                 warp_offset=None) -> Tuple[jnp.ndarray, ...]:
        """Packed serve of RESIZED-but-unnormalized uint8 images — the
        fast-input reader contract (`InputReader(fast_input=True)`).
        Normalization and padding re-zeroing run on device inside the one
        jitted serving program, so the host ships 4x fewer H2D bytes than
        the f32 path (same design as `train_lib.prepare_batch`).

        With ``warp_scale``/``warp_offset`` (the ``device_resize`` reader
        contract) the images are NATIVE-size and the bilinear resize itself
        also runs on device (`ops.image_ops.warp_resize_batch`)."""
        return self._dispatch_uint8(self._serve_u8_fn, self._serve_native_fn,
                                    images_u8, valid_hw, image_scales,
                                    warp_scale, warp_offset)

    def serve_detections(self, raw_images) -> Detections:
        """Structured (non-packed) serve."""
        self._mc_key, sub = jax.random.split(self._mc_key)
        return self._det_fn(self.variables, jnp.asarray(raw_images), sub)

    def serve_detections_preprocessed(self, images, image_scales=None
                                      ) -> Detections:
        """Structured serve of already normalized+resized batches — see
        `serve_preprocessed`."""
        images = jnp.asarray(images)
        if image_scales is None:
            image_scales = jnp.ones((images.shape[0],), jnp.float32)
        self._mc_key, sub = jax.random.split(self._mc_key)
        return self._det_pre_fn(self.variables, images,
                                jnp.asarray(image_scales, jnp.float32), sub)

    def serve_detections_preprocessed_uint8(self, images_u8, valid_hw=None,
                                            image_scales=None,
                                            warp_scale=None,
                                            warp_offset=None) -> Detections:
        """Structured serve of the fast-input reader contract (resized or,
        with warp params, NATIVE-size uint8) — see
        `serve_preprocessed_uint8`."""
        return self._dispatch_uint8(self._det_u8_fn, self._det_native_fn,
                                    images_u8, valid_hw, image_scales,
                                    warp_scale, warp_offset)

    def serve_sharded(self, mesh, raw_images) -> Tuple[jnp.ndarray, ...]:
        """Serve a pool-sized batch sharded over the mesh's 'data' axis.

        The AL / SSL pool-scoring path (BASELINE config #5): params are
        replicated, the batch splits across chips, and XLA keeps the whole
        preprocess→forward→postprocess program SPMD — no per-chip Python.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        self._mc_key, sub = jax.random.split(self._mc_key)
        fn = jax.jit(self._serve_impl,
                     in_shardings=(repl, data, repl),
                     out_shardings=data)
        images = jax.device_put(jnp.asarray(raw_images), data)
        variables = jax.device_put(self.variables, repl)
        return fn(variables, images, sub)

    def serve_sample_parallel(self, mesh, raw_images) -> Tuple[jnp.ndarray,
                                                               ...]:
        """Latency-oriented MC serving: batch replicated, the T MC-dropout
        samples sharded over the mesh's 'data' axis.

        The reference's only long axis is the MC sample loop
        (`efficientdet_keras.py:999-1024`, SURVEY §5: the sequence-parallel
        analog for this CNN detector) — here each chip runs T/n_devices
        full forwards and the T-moment reductions in the postprocess become
        ICI collectives. Requires mc_dropoutsamp % mesh['data'] == 0.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = self.config
        n_data = mesh.shape["data"]
        n_samples = self.num_members if self.ensemble \
            else int(cfg.mc_dropoutsamp)
        if n_samples % n_data != 0:
            raise ValueError(
                f"serve_sample_parallel requires the sample axis "
                f"({n_samples}) divisible by the mesh 'data' axis "
                f"({n_data})")
        repl = NamedSharding(mesh, P())
        sample = NamedSharding(mesh, P("data"))

        cache = self._sample_parallel_cache
        fn = cache[1] if cache is not None and cache[0] is mesh else None
        if fn is None:
            def impl(variables, raw_images, key):
                images, scales = preprocess_images(raw_images, cfg.image_size,
                                                   cfg.mean_rgb,
                                                   cfg.stddev_rgb)
                images = images.astype(self.model.dtype)
                cls_s, box_s = self._forward(variables, images, key)
                con = lambda t: jax.lax.with_sharding_constraint(t, sample)
                cls_s = [con(t) for t in cls_s]
                box_s = [con(t) for t in box_s]
                det = postprocess_global(cfg, cls_s, box_s,
                                         image_scales=scales,
                                         use_pallas_nms=self.use_pallas_nms)
                return det.packed()

            fn = jax.jit(impl, in_shardings=(repl, repl, repl))
            self._sample_parallel_cache = (mesh, fn)

        self._mc_key, sub = jax.random.split(self._mc_key)
        with mesh:
            variables = jax.device_put(self.variables, repl)
            return fn(variables, jax.device_put(
                jnp.asarray(raw_images), repl), sub)

    # -- export ---------------------------------------------------------------

    def export(self, output_dir: str) -> str:
        """Serialize the serving program as StableHLO (`jax.export`).

        The portable-artifact role of the reference's SavedModel export
        (`infer_lib.py:493-616`); parameters ride inside the artifact as
        constants closed over by the exported function.
        """
        from jax import export as jexport

        os.makedirs(output_dir, exist_ok=True)
        h, w = parse_image_size(self.config.image_size)
        spec_img = jax.ShapeDtypeStruct((self.batch_size, h, w, 3),
                                        jnp.float32)
        spec_key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        variables = self.variables

        def fn(raw_images, key_data):
            key = jax.random.wrap_key_data(key_data)
            return self._serve_impl(variables, raw_images, key)

        exported = jexport.export(jax.jit(fn))(spec_img, spec_key)
        path = os.path.join(output_dir, "serving.stablehlo")
        with open(path, "wb") as f:
            f.write(exported.serialize())
        self.config.save_to_yaml(os.path.join(output_dir, "config.yaml"))
        return path

    # -- benchmark ------------------------------------------------------------

    def benchmark(self, raw_images, warmup: int = 3, iters: int = 10
                  ) -> Dict[str, float]:
        """Latency/FPS — parity `infer_lib._benchmark`
        (`infer_lib.py:206-230`), implemented as one scanned program with
        per-step keys so relay memoization cannot skip work."""
        cfg = self.config
        raw_images = jnp.asarray(raw_images)

        images, scales = preprocess_images(raw_images, cfg.image_size,
                                           cfg.mean_rgb, cfg.stddev_rgb)
        images = images.astype(self.model.dtype)

        @jax.jit
        def scanned(variables, images, key):
            def step(carry, k):
                cls_s, box_s = self._forward(variables, images, k)
                det = postprocess_global(cfg, cls_s, box_s,
                                         image_scales=scales)
                return carry + jnp.sum(det.scores) + jnp.sum(det.boxes), None
            keys = jax.random.split(key, iters)
            total, _ = jax.lax.scan(step, 0.0, keys)
            return total

        import os as _os

        def fresh_key():
            return jax.random.PRNGKey(int.from_bytes(_os.urandom(4), "little"))

        # fetch the scalar value: on the tunneled TPU platform
        # block_until_ready does not reliably wait for remote execution
        for _ in range(warmup):
            float(scanned(self.variables, images, fresh_key()))
        t0 = time.perf_counter()
        float(scanned(self.variables, images, fresh_key()))
        dt = (time.perf_counter() - t0) / iters
        fps = raw_images.shape[0] / dt
        return {"latency_ms": dt * 1e3, "fps": fps}


def load_ensemble_variables(config: Config, member_dirs,
                            use_ema: bool = True):
    """Restore N members' variables and stack them for `ensemble_forward`.

    Accepts orbax model_dirs (each trained independently, e.g. with
    different seeds via ``udal_tpu.cli train``); EMA weights are swapped in
    when present, mirroring the reference's checkpoint restore
    (`/root/reference/src/utils_keras.py:125-235`).
    """
    from udal_tpu.models.ensemble import stack_variables
    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    _, template, _, _ = create_train_state(config, jax.random.PRNGKey(0), 1)
    members = []
    for d in member_dirs:
        state, epoch = restore_checkpoint(d, template)
        if epoch == 0:
            raise FileNotFoundError(f"no checkpoint in ensemble member {d}")
        members.append(swap_in_ema(state) if use_ema
                       else {"params": state.params,
                             "batch_stats": state.batch_stats})
    return stack_variables(members)


def load_exported(path: str):
    """Deserialize a StableHLO serving artifact back into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(raw_images, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return exported.call(jnp.asarray(raw_images),
                             jax.random.key_data(key))

    return call


# ---------------------------------------------------------------------------
# Post-training weight quantization (TFLite-INT8 analogue)
# ---------------------------------------------------------------------------

def quantize_weights_int8(variables: Any) -> Tuple[Any, Any]:
    """Per-channel symmetric INT8 quantization of conv/dense kernels.

    TPU-native analogue of the reference's TFLite INT8 post-training
    quantization export (`/root/reference/src/infer_lib.py:543-596`):
    kernels are stored int8 with per-output-channel scales; biases, BN
    parameters and statistics stay float. Serve via
    :func:`dequantize_weights` (weight-only) or the full W8A8 path
    :func:`serve_quantized_int8` with :func:`calibrate_activations_int8`.

    Returns (quantized_variables, scales_tree) — same tree structure, with
    kernel leaves int8 and scale leaves [C_out] float32 (non-kernel leaves
    have scale None).
    """
    import jax

    def quant(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = np.asarray(leaf)
        if name != "kernel" or arr.ndim < 2:
            return leaf, None
        axes = tuple(range(arr.ndim - 1))
        amax = np.maximum(np.abs(arr).max(axis=axes), 1e-12)
        scale = (amax / 127.0).astype(np.float32)
        q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return q, scale

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(variables)
    paths_leaves, treedef = leaves_with_paths
    qs, scales = [], []
    for path, leaf in paths_leaves:
        q, s = quant(path, leaf)
        qs.append(q)
        scales.append(s)
    return (jax.tree_util.tree_unflatten(treedef, qs),
            jax.tree_util.tree_unflatten(
                treedef, [s if s is not None else () for s in scales]))


def calibrate_activations_int8(config: Config, variables: Any,
                               rep_images, dtype=jnp.float32) -> Dict:
    """Per-conv-input activation scales from a representative batch.

    The activation half of the reference's TFLite INT8 post-training
    quantization (`/root/reference/src/infer_lib.py:543-596`: converter
    with a representative-dataset generator). Runs one (eager) forward over
    the representative images with a flax method interceptor recording the
    absolute-max input range of every Conv/Dense call.

    Returns {module_path: float_scale} mapping for
    :func:`serve_quantized_int8`.
    """
    import flax.linen as nn

    model = EfficientDetNet(config, dtype=dtype)

    def calib_fn(variables, raw):
        images, _ = preprocess_images(raw, config.image_size,
                                      config.mean_rgb, config.stddev_rgb)
        amaxes: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            if isinstance(context.module, (nn.Conv, nn.Dense)) and args and \
                    context.method_name == "__call__":
                path = "/".join(str(p) for p in context.module.path)
                amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                prev = amaxes.get(path)
                amaxes[path] = amax if prev is None else jnp.maximum(prev,
                                                                     amax)
            return next_fun(*args, **kwargs)

        # the interceptor records tracer values during tracing; returning
        # them makes the whole calibration one compiled program
        with nn.intercept_methods(interceptor):
            model.apply(variables, images.astype(dtype), train=False)
        return amaxes

    amaxes = jax.jit(calib_fn)(variables, jnp.asarray(rep_images))
    return {k: max(float(v), 1e-12) / 127.0 for k, v in amaxes.items()}


def make_int8_interceptor(act_scales: Dict):
    """Flax interceptor fake-quantizing every Conv/Dense input to INT8 with
    the calibrated per-tensor scales (symmetric). Traced into the jitted
    program, so the quantization error it simulates is exactly the W8A8
    numeric path."""
    import flax.linen as nn

    def interceptor(next_fun, args, kwargs, context):
        if isinstance(context.module, (nn.Conv, nn.Dense)) and args:
            path = "/".join(str(p) for p in context.module.path)
            s = act_scales.get(path)
            if s is not None and context.method_name == "__call__":
                x = args[0]
                q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                             -127, 127)
                args = (q.astype(jnp.float32) * s,) + args[1:]
                args = (args[0].astype(x.dtype),) + args[1:]
        return next_fun(*args, **kwargs)

    return interceptor


def serve_quantized_int8(config: Config, variables: Any, act_scales: Dict,
                         raw_images, dtype=jnp.float32):
    """Full W8A8 simulated INT8 serve: int8 per-channel weights
    (:func:`quantize_weights_int8`) + calibrated int8 activations, through
    the standard uncertainty postprocess. Returns a `Detections`.

    On v5e the throughput path stays bf16 (the MXU has no int8 speedup for
    these conv shapes worth the relayout); this path exists to *measure*
    what the reference's INT8 export costs in accuracy — see
    tests/test_int8_quant.py and docs/PERF_ANALYSIS.md.
    """
    import flax.linen as nn

    from udal_tpu.ops.postprocess import postprocess_global

    q, scales = quantize_weights_int8(variables)
    model = EfficientDetNet(config, dtype=dtype)
    interceptor = make_int8_interceptor(act_scales)

    @jax.jit
    def run(qvars, raw):
        variables = dequantize_weights(qvars, scales, dtype=None)
        images, img_scales = preprocess_images(raw, config.image_size,
                                               config.mean_rgb,
                                               config.stddev_rgb)
        with nn.intercept_methods(interceptor):
            cls_s, box_s = model.apply(variables, images.astype(dtype),
                                       train=False)
        return postprocess_global(config, list(cls_s), list(box_s),
                                  image_scales=img_scales)

    return run(q, jnp.asarray(raw_images))


def dequantize_weights(quantized: Any, scales: Any, dtype=None) -> Any:
    """Inverse of :func:`quantize_weights_int8` (runs inside jit)."""
    import jax
    import jax.numpy as jnp

    def deq(q, s):
        if isinstance(s, tuple) and s == ():
            return q
        x = q.astype(jnp.float32) * jnp.asarray(s)
        return x.astype(dtype) if dtype is not None else x

    return jax.tree_util.tree_map(
        deq, quantized, scales,
        is_leaf=lambda x: isinstance(x, tuple) and x == ())
