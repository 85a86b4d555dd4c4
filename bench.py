"""Benchmark: training throughput of the flagship WaveNet on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: waveform samples consumed per second by full training steps (forward +
backward + Adam update) of the benchmarks.txt canonical TIMIT WaveNet config
(n_stacks 5, n_layers 10, res_channels 96, DMoL 2^16 bins, 16000-sample
segments). Baseline for vs_baseline: the BASELINE.json north star of 5× a
reference single-GPU throughput; the reference repo records no absolute
numbers (BASELINE.md), so vs_baseline reports value / 500_000 (500k samples/s
≈ 5 × a ~100k samples/s single-GPU PyTorch estimate).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from blvm_tpu.models import WaveNet
    from blvm_tpu.parallel import make_mesh, make_train_step
    from blvm_tpu.training import TrainState, get_optimizer

    make_mesh(1)

    model = WaveNet(n_layers=10, n_stacks=5, res_channels=96, num_mix=10, num_bins=2**16)

    B, T = 8, 16000  # benchmarks.txt segment length; batch sized to fill the chip
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    x_sl = jnp.full((B,), T, jnp.int32)

    # init inside jit: eager op-by-op init would trigger per-op compilation
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x, x_sl)
    )(jax.random.PRNGKey(0))

    tx = get_optimizer("Adam", 3e-4)
    state = TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx, rng=jax.random.PRNGKey(2))

    def loss_fn(params, rng_key, batch, scalars):
        loss, mets, _ = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng_key}
        )
        return loss, (mets, None)

    step = make_train_step(loss_fn)
    batch = {"x": x, "x_sl": x_sl}

    # warmup / compile — two steps: the first call's output state carries mesh
    # shardings, so the second call compiles the steady-state executable
    for _ in range(2):
        state, mets = step(state, batch, {})
        jax.block_until_ready(mets["loss"])

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, mets = step(state, batch, {})
    jax.block_until_ready(mets["loss"])
    dt = time.perf_counter() - t0

    samples_per_sec = B * T * n_steps / dt
    baseline = 500_000.0  # 5x reference single-GPU target (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "wavenet_train_throughput_waveform_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
