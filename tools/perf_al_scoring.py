"""Official benchmark for BASELINE config #5: active-learning acquisition
scoring of an unlabeled pool.

Measures the AL loop's pool-scoring stage end to end at the KITTI op
point: TFRecord pool → InputReader (device_resize uint8 contract) →
10-pass MC-dropout serve (bf16, on-device uncertainty postprocess) →
array-native pool collection (`apps.al_scoring.collect_pool`: packed
[n_images, max_dets, ...] arrays, NO per-detection python dicts) →
all 11 strategies scored as vectorized masked reductions → top-k
selection. This is the path `ActiveLearning.run` drives each budget
iteration (reference: `/root/reference/src/active_learning_loop.py:
528-840,994-1136`, whose per-dict host loop the array path replaces;
`--dict-path` measures the legacy artifact-compatible shim instead).

Strategy names follow the reference grammar (README "Active Learning"):
the metric is the LAST underscore token; combination families are
combo/ental/alluncert/epuncert/sota/highep_lowal.

On a pod slice the same pool scoring shards over the mesh
(`serve_sharded`; exercised by `__graft_entry__.dryrun_multichip`) — one
chip here, so the headline is img/s through scoring on a single v5e.

Writes docs/AL_SCORING_BENCH.json.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STRATEGIES = [
    "entropy", "mean_entropy", "norm_mcbox", "norm_albox",
    "mcclass", "combo", "ental", "alluncert",
    "epuncert", "sota", "alluncert_highep_lowal",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--select", type=int, default=205)
    ap.add_argument("--dict-path", action="store_true",
                    help="measure the legacy per-detection dict shim")
    ap.add_argument("--device-staged", action="store_true",
                    help="pre-stage the pool batches on device, then time "
                         "serve+collect+score. Isolates the device rate "
                         "from the axon relay's ~35-40 MB/s H2D tunnel "
                         "(an environment artifact perf_loop.py documents; "
                         "a production host-attached TPU feeds over PCIe)")
    ap.add_argument("--ckpt", default=None,
                    help="restore model variables from this checkpoint dir "
                         "(trained model -> non-degenerate rankings)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: 16-image pool, 128px, tiny repeats")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.pool, args.batch, args.select = 16, 2, 4

    from tools.perf_e2e import make_kitti_like_dataset
    from udal_tpu.apps import al_scoring as als
    from udal_tpu.apps.active_learning import score_images, select_images
    from udal_tpu.apps.infer import InferImages
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "128x128" if args.tiny else "1024x512"
    cfg.num_classes = 7
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = 10
    cfg.is_training_bn = False
    if args.tiny:
        cfg.fpn_cell_repeats = 1
        cfg.box_class_repeats = 1
        cfg.mc_dropoutsamp = 2

    work = tempfile.mkdtemp(prefix="al_bench_")
    data = os.path.join(work, "pool.tfrecord")
    make_kitti_like_dataset(data, args.pool)

    variables = None
    if args.ckpt:
        from udal_tpu.train.train_lib import create_train_state
        from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

        _, state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), 1)
        state, _ = restore_checkpoint(args.ckpt, state)
        variables = swap_in_ema(state)
    drv = ServingDriver.create("efficientdet-d0", variables=variables,
                               overrides=dict(cfg.as_dict()),
                               batch_size=args.batch)

    def mk_reader():
        # eval contract: one ordered pass, no train-time augmentation
        return InputReader(data, is_training=False, fast_input=True,
                           prefetch=3, seed=0,
                           device_resize=not args.tiny)

    n_batches = args.pool // args.batch

    def run_arrays():
        r0 = mk_reader()
        it0 = r0(cfg, args.batch)
        t0 = time.perf_counter()
        als.collect_pool(drv, [next(it0)])
        compile_s = time.perf_counter() - t0
        it0.close()

        reader = mk_reader()
        it = reader(cfg, args.batch)
        breakdown = None
        if args.device_staged:
            import jax.numpy as jnp

            # Pass 1 — host only: TFRecord read + decode (the reader's CPU
            # work), no device upload. This is the `decode` term.
            rd = mk_reader()
            itd = rd(cfg, args.batch)
            t0 = time.perf_counter()
            for _ in range(n_batches):
                next(itd)
            decode_s = time.perf_counter() - t0
            itd.close()

            # Pass 2 — host + upload: same iteration with every batch
            # pushed to the device. upload-only = pass2 - pass1 (the axon
            # relay H2D tunnel on this host; PCIe in production).
            staged = []
            t0 = time.perf_counter()
            for _ in range(n_batches):
                images, labels = next(it)
                staged.append((
                    jnp.asarray(images),
                    {k: (jnp.asarray(v) if not isinstance(v, list) else v)
                     for k, v in labels.items()}))
            # force the uploads to complete before timing
            staged[-1][0].block_until_ready()
            stage_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            pool = als.collect_pool(drv, iter(staged))
            serve_s = time.perf_counter() - t0
            breakdown = {"decode_s": round(decode_s, 3),
                         "h2d_s": round(stage_s - decode_s, 3),
                         "device_serve_s": round(serve_s, 3)}
        else:
            t0 = time.perf_counter()
            pool = als.collect_pool(drv,
                                    (next(it) for _ in range(n_batches)))
            serve_s = time.perf_counter() - t0
        it.close()

        t0 = time.perf_counter()
        per_strategy = {}
        for s in STRATEGIES:
            scores, _, names = als.score_pool(pool, s, opt_params=[0.5, 0.5])
            picks = als.select_pool(pool, s, args.select,
                                    opt_params=[0.5, 0.5])
            per_strategy[s] = {
                "n_scored": len(names), "n_picked": len(picks),
                "top_score": float(np.max(scores)),
                "distinct_scores": int(np.unique(
                    np.round(scores, 12)).size)}
        score_s = time.perf_counter() - t0
        return compile_s, serve_s, score_s, pool.n_detections, \
            per_strategy, reader.wait_stats()["wait_fraction"], breakdown

    def run_dicts():
        app = InferImages(drv, work, min_score=0.0)
        r0 = mk_reader()
        it0 = r0(cfg, args.batch)
        t0 = time.perf_counter()
        app.run([next(it0)])
        compile_s = time.perf_counter() - t0
        it0.close()

        reader = mk_reader()
        it = reader(cfg, args.batch)
        t0 = time.perf_counter()
        rows = app.run(next(it) for _ in range(n_batches))
        serve_s = time.perf_counter() - t0
        it.close()

        t0 = time.perf_counter()
        per_strategy = {}
        for s in STRATEGIES:
            scores, _, names = score_images(rows, s, opt_params=[0.5, 0.5])
            picks = select_images(rows, s, args.select,
                                  opt_params=[0.5, 0.5])
            per_strategy[s] = {
                "n_scored": len(names), "n_picked": len(picks),
                "top_score": float(np.max(scores)),
                "distinct_scores": int(np.unique(
                    np.round(scores, 12)).size)}
        score_s = time.perf_counter() - t0
        return compile_s, serve_s, score_s, len(rows), per_strategy, \
            reader.wait_stats()["wait_fraction"], None

    compile_s, serve_s, score_s, n_rows, per_strategy, wait, breakdown = (
        run_dicts() if args.dict_path else run_arrays())

    report = {
        "metric": "images/sec, AL pool acquisition scoring (BASELINE "
                  "config #5): MC-dropout serve + " +
                  ("per-detection dict rows" if args.dict_path
                   else "array-native pool collection") +
                  f" + {len(STRATEGIES)}-strategy scoring + top-k selection"
                  + (" [pool pre-staged on device: device rate, relay "
                     "H2D tunnel excluded]" if args.device_staged else ""),
        "path": ("dict" if args.dict_path else
                 "arrays_staged" if args.device_staged else "arrays"),
        "pool": args.pool,
        "batch": args.batch,
        "ckpt": args.ckpt,
        "img_per_s": round(n_batches * args.batch / (serve_s + score_s), 2),
        "serve_s": round(serve_s, 2),
        "score_all_strategies_s": round(score_s, 3),
        "compile_s": round(compile_s, 1),
        "wait_fraction": round(wait, 4),
        "n_detection_rows": n_rows,
        "strategies": per_strategy,
    }
    if breakdown is not None:
        # serve-path decomposition (VERDICT r4 #5): host decode vs relay
        # H2D upload vs pure device serve, measured as two extra ordered
        # passes over the same reader contract
        report["serve_breakdown"] = breakdown
    print(json.dumps({k: v for k, v in report.items()
                      if k != "strategies"}))
    if args.out:
        out = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                out = json.load(f)
            if "img_per_s" in out:       # legacy single-section file
                out = {}
        out[report["path"]] = report
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
