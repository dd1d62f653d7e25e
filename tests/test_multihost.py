"""Multi-host bootstrap: 2 OS processes, gloo-backed ``jax.distributed``.

The reference has no distributed support at all (SURVEY.md §2c); the
multi-host leg of this framework is ``parallel/mesh.initialize_distributed``
(DCN bootstrap) + the same sharded step the single-process SPMD tests pin.
This test executes that bootstrap for real: two separate Python processes
initialize a 2-process JAX distributed runtime over localhost, build a
('data', 'graph') mesh spanning BOTH processes (1 CPU device each), and
run the sharded loss on a tiny graph — asserting the cross-process value
matches the single-device reference computed in the parent.

Run directly as a worker:  python tests/test_multihost.py <pid> <nproc> <port> <out>
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_SEED = 123
POS_WEIGHT = 1.5


def _build_fixture():
    """Deterministic tiny sample + params (identical in every process)."""
    import jax

    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.models.model import init_model_params
    from tests.test_sharded import make_sample

    cfg = ModelConfig(
        num_gnn_layers=2, hidden_features=32, hidden_edge_features=8,
        hidden_edge_scores=16, nb_pos_enc=8,
    )
    rng = np.random.default_rng(WORKER_SEED)
    sample = make_sample(rng, n=96, e=520)
    params = init_model_params(jax.random.PRNGKey(3), cfg)
    return cfg, sample, params


def _worker(pid: int, nproc: int, port: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from gnnome_tpu.parallel.mesh import initialize_distributed, make_mesh
    from gnnome_tpu.parallel.sharded import make_sharded_loss, prepare_batch

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_index() == pid
    assert jax.device_count() == nproc, jax.device_count()
    assert jax.local_device_count() == 1

    cfg, sample, params = _build_fixture()
    mesh = make_mesh(data=1, graph=nproc)  # spans both processes
    batch = prepare_batch([sample], mesh)
    loss_fn = make_sharded_loss(mesh, batch_norm=cfg.batch_norm)
    import jax.numpy as jnp

    loss = float(jax.jit(loss_fn)(params, batch, jnp.float32(POS_WEIGHT)))
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": loss,
                   "devices": jax.device_count()}, f)


@pytest.mark.slow
def test_two_process_distributed_loss(tmp_path):
    """initialize_distributed → 2-process mesh → sharded loss == reference."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # one CPU device per process: the parent test env forces 8 virtual
    # devices (conftest), which would put all 8+8 on two processes — the
    # point here is the cross-process mesh, so strip the flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"loss_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid), "2",
             str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-2000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["devices"] == 2 for r in results)
    # both processes see the same replicated global loss
    assert results[0]["loss"] == results[1]["loss"]

    # single-device reference in the parent process
    import jax.numpy as jnp

    from tests.test_sharded import single_device_loss

    cfg, sample, params = _build_fixture()
    ref = float(single_device_loss(params, sample, jnp.float32(POS_WEIGHT),
                                   cfg))
    np.testing.assert_allclose(results[0]["loss"], ref, rtol=2e-5, atol=2e-5)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
