"""Device mesh and sharding layout for SPMD training/serving.

TPU-native replacement for the reference's distribution strategies
(`/root/reference/src/train_flags.py:236-263`: TPUStrategy /
MirroredStrategy / OneDeviceStrategy). Here a single code path covers all
topologies: build a `jax.sharding.Mesh`, annotate data/params, and let XLA
insert the collectives over ICI (`psum` for gradients replaces
`cross_replica_sum`, `utils.py:62-85`).

Axes:
  * ``data``  — batch (data parallelism; the reference's only strategy);
  * ``model`` — reserved for tensor-parallel sharding of the widest convs /
    the MC-ensemble member axis on larger slices (size 1 by default — d0
    fits comfortably on one chip).

BatchNorm note: under jit-based SPMD the batch-stat reductions are global
across the data axis automatically (GSPMD sees the full array), which
subsumes the reference's grouped TpuBatchNormalization (≤32-core groups,
`utils.py:186-227`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    mesh_devices = np.asarray(devices[: n_data * n_model]).reshape(
        (n_data, n_model))
    return Mesh(mesh_devices, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs/labels."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over 'data'."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_state(mesh: Mesh, state):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), state)


def cross_replica_mean_groups(n_devices: int, group_size: int = 32):
    """axis_index_groups for grouped BN moments (≤group_size replicas),
    mirroring `utils.py:186-227` when exact reference training dynamics are
    wanted instead of global-batch BN."""
    num_groups = max(1, n_devices // min(group_size, n_devices))
    per = n_devices // num_groups
    return [list(range(g * per, (g + 1) * per)) for g in range(num_groups)]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Multi-host (multi-slice / DCN) runtime initialization.

    The reference resolves TPU pods through `TPUClusterResolver` + gRPC
    (`train_flags.py:60-78,236-241`); the JAX-native equivalent is
    `jax.distributed.initialize`, after which `jax.devices()` spans every
    host and the same `make_mesh` + GSPMD path scales across DCN with no
    code changes (collectives ride ICI within a slice and DCN across).
    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere. Safe to call when already initialized.

    Returns a summary dict (process index/count, local/global devices).
    """
    if coordinator_address is not None or (num_processes or 1) > 1:
        # NOTE: must not touch jax.devices()/process_count() first — any
        # backend-initializing call before jax.distributed.initialize makes
        # it unusable (covered by tests/test_multihost.py)
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:   # already initialized
            if "already" not in str(e).lower():
                raise
    elif coordinator_address is None and num_processes is None:
        try:
            # Cloud TPU auto-detection; a no-op single-process fallback
            jax.distributed.initialize()
        except Exception:  # noqa: BLE001 - not in a multi-host environment
            pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def make_multihost_mesh(n_model: int = 1,
                        ici_axis: str = "data") -> Mesh:
    """Mesh over every global device (all hosts). The data axis spans
    hosts — per-host input sharding comes from InputReader's
    shard_id/num_shards (jax.process_index/count defaults)."""
    return make_mesh(n_model=n_model)


def grouped_batch_stats(x, mesh: Mesh, group_size: int = 32):
    """Per-group batch moments over the 'data' axis — TpuBatchNormalization
    semantics (`utils.py:186-227`: moments aggregated over ≤32-core groups
    instead of globally).

    Args:
      x: [B, ..., C] batch (B divisible by the data-axis size).
      mesh: ('data', 'model') mesh.
      group_size: max replicas per aggregation group.

    Returns (mean, var), each [n_data, C] — row d holds the moments of the
    group that device d belongs to (broadcastable back into a shard_map'd
    normalization).
    """
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    n_data = mesh.shape["data"]
    groups = cross_replica_mean_groups(n_data, group_size)
    # static group-membership matrix: row d -> averaging weights over devices
    member = np.zeros((n_data, n_data), np.float32)
    for g in groups:
        for d in g:
            member[d, list(g)] = 1.0 / len(g)

    def stats(xs):
        red = tuple(range(xs.ndim - 1))
        m = jnp.mean(xs, axis=red)
        m2 = jnp.mean(jnp.square(xs), axis=red)
        # group reduction = all_gather + static membership row (shard_map
        # has no pmean(axis_index_groups) yet)
        m_all = jax.lax.all_gather(m, "data")        # [n_data, C]
        m2_all = jax.lax.all_gather(m2, "data")
        row = jnp.asarray(member)[jax.lax.axis_index("data")]
        m = row @ m_all
        m2 = row @ m2_all
        return m[None], (m2 - jnp.square(m))[None]

    return shard_map(stats, mesh=mesh,
                     in_specs=P("data"),
                     out_specs=(P("data"), P("data")))(x)


# ---------------------------------------------------------------------------
# Tensor parallelism (the 'model' axis)
# ---------------------------------------------------------------------------

def param_partition_spec(path: str, x, n_model: int):
    """Channel-dim PartitionSpec for one parameter leaf.

    Output-channel sharding over the 'model' axis wherever the trailing dim
    divides: conv kernels [kh, kw, ci, co] shard co, depthwise kernels
    [k, k, 1, C] shard C, and BN scale/bias/mean/var [C] shard C — so the
    activations flow channel-sharded through expand -> dw -> SE and GSPMD
    inserts the contraction collectives at the projects/heads. Scalars and
    non-divisible leaves stay replicated.
    """
    from jax.sharding import PartitionSpec as P

    if n_model <= 1 or x.ndim == 0:
        return P()
    if x.shape[-1] % n_model != 0:
        return P()
    return P(*([None] * (x.ndim - 1) + ["model"]))


def shard_params_tp(mesh: Mesh, tree):
    """device_put a params/batch_stats pytree with channel sharding over
    the 'model' mesh axis (replicated over 'data')."""
    n_model = mesh.shape["model"]

    def put(path, x):
        spec = param_partition_spec(jax.tree_util.keystr(path), x, n_model)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def shard_opt_state_tp(mesh: Mesh, opt_state, params):
    """device_put an optax state with param-moment subtrees channel-sharded.

    Subtrees structurally identical to `params` (Adam mu/nu, momentum trace,
    …) get the same per-leaf channel sharding as the params; everything else
    (counts, EmptyState, schedule states) is replicated. Preserves restored
    optimizer moments across a tensor-parallel reshard instead of resetting
    them with tx.init."""
    pdef = jax.tree_util.tree_structure(params)

    def param_like(node):
        try:
            return jax.tree_util.tree_structure(node) == pdef
        except Exception:  # noqa: BLE001 - unhashable/odd node
            return False

    def put(node):
        if param_like(node):
            return shard_params_tp(mesh, node)
        return jax.device_put(node, replicated(mesh))

    return jax.tree_util.tree_map(put, opt_state, is_leaf=param_like)


def shard_state_tp(mesh: Mesh, state, tx=None):
    """Shard a TrainState for data x model SPMD: params/batch_stats/EMA get
    channel sharding; the optimizer state keeps its (possibly restored)
    values, resharded so its moment pytrees inherit the param layout."""
    params = shard_params_tp(mesh, state.params)
    return state.replace(
        step=jax.device_put(state.step, replicated(mesh)),
        params=params,
        batch_stats=shard_params_tp(mesh, state.batch_stats),
        opt_state=shard_opt_state_tp(mesh, state.opt_state, state.params),
        ema_params=(shard_params_tp(mesh, state.ema_params)
                    if state.ema_params is not None else None),
    )
