"""Multi-process (multi-host) smoke test over `jax.distributed`.

Covers the one code path the virtual 8-device mesh tests miss:
`parallel.mesh.initialize_multihost` + `make_multihost_mesh` with a real
2-process coordinator handshake (the analog of the reference's
TPUClusterResolver/gRPC cluster path, `/root/reference/src/train_flags.py:
236-263`). Each process brings 2 virtual CPU devices; the global mesh spans
4, a process-local-sharded array reduces globally, and both processes must
agree on the psum result.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import numpy as np
    import jax
    # the session sitecustomize pins the tunneled-TPU platform and ignores
    # env overrides; the config update (pre-backend-init) still wins
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, {repo!r})
    from udal_tpu.parallel.mesh import (initialize_multihost,
                                        make_multihost_mesh)

    pid = int(sys.argv[1])
    info = initialize_multihost(coordinator_address=sys.argv[2],
                                num_processes=2, process_id=pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info

    mesh = make_multihost_mesh()
    assert mesh.shape["data"] == 4, dict(mesh.shape)

    # per-process local shard -> global array -> global reduction
    local = (np.arange(4, dtype=np.float32).reshape(2, 2)
             + 100.0 * jax.process_index())
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(arr)
    expected = float(np.arange(4).sum() * 2 + 100.0 * 2 * 2)
    got = float(total)
    assert abs(got - expected) < 1e-5, (got, expected)
    print(f"proc{{pid}} OK {{got}}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-process run timed out: {outs}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} OK" in out, out[-3000:]
