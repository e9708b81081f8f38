"""Multi-process runtime: two OS processes form ONE JAX runtime.

The real thing, not a simulation: two subprocesses × 4 virtual CPU devices
each call ``parallel.runtime.initialize_runtime`` against a shared
coordinator and must agree on the global device count, a leader broadcast,
and a cross-process psum over a global ``data``-axis mesh — the CPU
rehearsal of a multi-host TPU pod (the reference's ``torch.distributed``
launcher story, torchscale ``global_groups.py``, done the JAX way).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["MOC_TPU_COORDINATOR"] = f"localhost:{port}"
    os.environ["MOC_TPU_NUM_PROCESSES"] = str(nproc)
    os.environ["MOC_TPU_PROCESS_ID"] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from moc_tpu.parallel import runtime
    from moc_tpu.parallel.mesh import make_mesh

    assert runtime.initialize_runtime()          # env-driven form
    assert runtime.initialize_runtime()          # idempotent
    assert jax.process_count() == nproc and jax.process_index() == pid
    assert len(jax.local_devices()) == 4 and jax.device_count() == 4 * nproc

    import numpy as np
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh({"data": -1})               # global mesh: all 8 devices
    assert mesh.size == 4 * nproc

    # leader broadcast: every process must see process 0's seed
    seed = runtime.broadcast_from_leader(np.int32(1234 if pid == 0 else -1))
    assert int(seed) == 1234, seed
    runtime.assert_same_across_processes(seed, "seed")

    # per-host shards -> one global array -> cross-process psum
    local = np.arange(4, dtype=np.float32) + 4 * pid      # rows 0-3 / 4-7
    g = runtime.host_local_to_global(local, mesh, P("data"))
    total = jax.jit(
        jax.shard_map(lambda a: jax.lax.psum(a, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P()))(g)
    total = np.asarray(jax.device_get(total))
    assert total.shape == (1,) and total[0] == 28.0, total  # sum(0..7)

    # round-trip back to this process's host-local shard
    back = np.asarray(runtime.global_to_host_local(g, mesh, P("data")))
    np.testing.assert_array_equal(back, local)

    runtime.barrier("test_done")
    print(f"WORKER_OK pid={pid} total={total[0]}")
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_runtime(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK pid={i} total=28.0" in out, out[-3000:]


def test_single_process_noop(monkeypatch):
    """Without coordinator config the bootstrap is a no-op and the
    collective helpers degrade to identity."""
    import numpy as np

    from moc_tpu.parallel import runtime

    for var in ("MOC_TPU_COORDINATOR", "MOC_TPU_NUM_PROCESSES",
                "MOC_TPU_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(runtime, "_initialized", False)
    assert runtime.initialize_runtime() is False
    assert runtime.is_initialized() is False
    runtime.barrier()                                    # no-op
    tree = {"a": np.arange(3), "b": 7}
    assert runtime.broadcast_from_leader(tree) is tree   # identity
    runtime.assert_same_across_processes(np.float32(1.0))
