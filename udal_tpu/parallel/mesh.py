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
