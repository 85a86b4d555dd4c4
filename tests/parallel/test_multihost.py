"""Multi-host smoke test: two ``jax.distributed``-joined CPU processes run one
data-parallel train step on per-host-sharded data and must agree on the loss —
which must also equal the single-process loss on the same global batch
(SURVEY §5.8: per-host file-list sharding + XLA collectives, the one genuinely
new subsystem vs the reference's single-process design).
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("multihost_worker.py")
REPO_ROOT = Path(__file__).resolve().parents[2]


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_loss_identical():
    port = free_port()
    env = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_FLAGS", "JAX_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO_ROOT)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = {}
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS pid=(\d) loss=([-\d.e+]+)", out)
        assert m, f"no loss line in worker output:\n{out}"
        losses[int(m.group(1))] = float(m.group(2))

    assert losses[0] == losses[1], f"hosts disagree: {losses}"

    # single-process reference on the same global batch (order-invariant loss)
    import jax
    import jax.numpy as jnp

    from blvm_tpu.models import WaveNet
    from tests.parallel.multihost_worker import build_example

    T = 64
    # global row order = proc0's rows then proc1's (device order in the mesh)
    order = [0, 2, 1, 3]
    x = jnp.asarray(np.stack([build_example(i, T) for i in order]))
    x_sl = jnp.full((4,), T, jnp.int32)

    model = WaveNet(n_layers=2, n_stacks=1, res_channels=8, num_mix=2)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "sample": jax.random.PRNGKey(1)}, jnp.zeros((1, T), jnp.float32), jnp.full((1,), T, jnp.int32)
        )
    )(jax.random.PRNGKey(0))
    # train-step rng: TrainState folds its step rng identically in the workers;
    # the loss is computed before the update, from rng=fold_in(key(2), step=0)
    from blvm_tpu.training import TrainState, get_optimizer
    from blvm_tpu.parallel import make_mesh, make_train_step, shard_batch

    mesh = make_mesh(1)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=get_optimizer("Adam", 1e-3), rng=jax.random.PRNGKey(2)
    )

    def loss_fn(params, rng, batch, scalars):
        loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng})
        return loss, (mets, None)

    step = make_train_step(loss_fn, mesh=mesh)
    _, mets = step(state, shard_batch({"x": x, "x_sl": x_sl}, mesh), {})
    ref_loss = float(jax.device_get(mets["loss"]))

    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-6, atol=1e-7)
