"""Worker process for the multi-host smoke test (see test_multihost.py).

Each process owns one CPU device; together they form a 2-process "cluster"
joined via ``jax.distributed.initialize``. The worker shards the example list
by process, builds its local rows, assembles the global batch, runs ONE
data-parallel train step over the global mesh, and prints the loss — which
must be bitwise-identical across hosts (same SPMD program, psum over the
collective backend).

Run: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_example(example_id: int, T: int = 64):
    import numpy as np

    rng = np.random.default_rng(100 + example_id)
    return rng.uniform(-1, 1, T).astype(np.float32)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np

    from blvm_tpu.models import WaveNet
    from blvm_tpu.parallel import make_global_batch, make_mesh, shard_examples_by_process
    from blvm_tpu.parallel.train_step import make_train_step
    from blvm_tpu.training import TrainState, get_optimizer

    T = 64
    all_examples = list(range(4))
    local_examples = shard_examples_by_process(all_examples)
    x_local = np.stack([build_example(i, T) for i in local_examples])
    x_sl_local = np.full((len(local_examples),), T, np.int32)

    mesh = make_mesh()  # all (global) devices, 1-D data axis
    batch = make_global_batch({"x": x_local, "x_sl": x_sl_local}, mesh)

    model = WaveNet(n_layers=2, n_stacks=1, res_channels=8, num_mix=2)
    x_init = jnp.zeros((1, T), jnp.float32)
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x_init, jnp.full((1,), T, jnp.int32))
    )(jax.random.PRNGKey(0))

    tx = get_optimizer("Adam", 1e-3)
    state = TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx, rng=jax.random.PRNGKey(2))

    def loss_fn(params, rng, batch, scalars):
        loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng})
        return loss, (mets, None)

    step = make_train_step(loss_fn, mesh=mesh)
    state, mets = step(state, batch, {})
    loss = float(jax.device_get(mets["loss"]))
    print(f"MULTIHOST_LOSS pid={pid} loss={loss!r}", flush=True)


if __name__ == "__main__":
    main()
