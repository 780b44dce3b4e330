"""Abstract-eval smoke tests for the driver entry points.

`jax.eval_shape` traces the full benchmark / entry programs without
compiling or executing them — catching shape, dtype and tracing
regressions in seconds on CPU (the driver runs the real things on TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # entry() runs a real (CPU) init forward


def test_bench_program_traces():
    import bench

    cfg, model = bench.build(jnp.bfloat16)
    x = jnp.zeros((bench.BATCH, 512, 1024, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), variables)
    fn = bench._mc_batch_fn(cfg, model)
    out = jax.eval_shape(fn, variables, x, jax.random.PRNGKey(0))
    assert out.shape == () and out.dtype == jnp.float32

    # ref-style path traces too (batch 1)
    cfg32, model32 = bench.build(jnp.float32)
    v32 = jax.eval_shape(lambda: model32.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))
    fn32 = bench._ref_style_fn(cfg32, model32)
    out32 = jax.eval_shape(fn32, v32, jax.ShapeDtypeStruct(
        (1, 512, 1024, 3), jnp.float32), jax.random.PRNGKey(0))
    assert out32.shape == ()


def test_entry_program_traces():
    import __graft_entry__ as ge

    fn, (variables, images) = ge.entry()
    out = jax.eval_shape(fn, variables, images)
    cls_shapes = [tuple(o.shape) for o in out[0]]
    assert cls_shapes[0][1:3] == (64, 128)   # P3 of 1024x512
    assert len(cls_shapes) == 5
