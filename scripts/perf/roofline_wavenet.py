"""Roofline analysis of the flagship WaveNet train step (VERDICT round-2 #1).

Answers, with numbers rather than vibes, the question "how far is the measured
step from the hardware's ceiling, and is the gap closable?" for the canonical
benchmark config (B=8, T=16000, n_stacks=5, n_layers=10, res_channels=96,
DMoL 2^16, bf16 residual stack — the `bench.py` flagship, reference workload
``blvm/models/wavenet/wavenet_modules.py:120-211``).

Three ceilings are computed:

1. **Compute ceiling** — analytic MXU FLOPs (exact, walked from the dilation
   schedule) divided by the chip's dense bf16 peak. Also reported with the
   128-lane padding the architecture forces: every (·, 96) operand occupies a
   (·, 128) tile on the MXU and in tiled HBM layouts, so the hardware executes
   ≥ (128/96)× the nominal MAC columns. 96 channels is the checkpoint-parity
   surface (reference config); padding the model to 128 real channels was
   measured SLOWER (see `--negative-levers`).

2. **Memory ceiling (minimal-traffic model)** — a defensible lower bound on
   HBM bytes: per block, forward reads its input once and writes only the
   tensors autodiff must save (gated activation, residual out, skip slice,
   two pre-activations); backward reads those and writes the input gradient.
   Tile padding (lane dim rounded up to 128) is applied because tiled layouts
   physically move padded bytes. Anything XLA materializes beyond this
   (fusion boundaries, layout copies) only RAISES real traffic, so the model
   is a true floor.

3. **XLA's own cost model** — `compiled.cost_analysis()` flops / bytes.
   Bytes are counted per HLO op BEFORE fusion, so this wildly overcounts
   traffic (the round-2 measured step beats the "memory ceiling" it implies
   by 2.4x); it is reported for calibration, not as a bound.

Run with `--measure` on a chip to time the step with the bench.py discipline
(distinct batches, device_get-closed timing) and print attainment vs each
ceiling. Without a TPU it prints the analytic model only.

Round-3 conclusions recorded from this script on a v5e
(`NOTES.md` round-3 section has the full table):
  measured 54.9 ms/step = 2.33M samples/s monolithic;
  compute floor 12.8 ms (23.4% nominal MFU; 41.6% counting forced lane
  padding), minimal-traffic memory floor 32.3 ms -> 58.8% of the memory-bound
  ceiling. ONE positive lever was found after this analysis: gradient
  accumulation (bench.py --accum; exact frames-weighted update) relieves the
  residual capacity pressure -- accum=2 measured 46.2 ms = 2.77M samples/s
  (69.8% of the memory floor), accum=4 47.5 ms (past the sweet spot).
  Every other single-knob lever measured NEGATIVE on this chip:
    remat            61.8 ms  (recompute adds more traffic than it saves)
    res_channels=128 118.6 ms (temp alloc 9.2->12.1 GB, capacity-induced remat)
    B=16             173.4 ms (temp alloc 15.6 GB > HBM, heavy remat)
    fused 4-way gate dots 72.2 ms (blocks the output-slice overlap trick)
    Pallas fused stack: cut round-2 (device-wedging through the relay,
      single-block variant 1.7x slower than XLA's own fusion)
  The residual ~2.3x above the interacting floors is the 50-deep serial chain
  of (8, ~19k, 96->128-padded) ops each running at 25-40% of peak HBM
  bandwidth — closable only by a hand-scheduled multi-block kernel, which is
  the documented Pallas cut.
"""

import argparse
import json
import math

PEAK_FLOPS_BF16 = 197e12  # v5e dense bf16
PEAK_HBM = 819e9  # v5e HBM bytes/s
LANE = 128


def pad_lane(c: int) -> int:
    return ((c + LANE - 1) // LANE) * LANE


def analytic_model(B=8, T=16000, C=96, n_layers=10, n_stacks=5, kernel_size=2, base_dilation=2, out_features=30):
    """Walk the stack; return dict of FLOPs and minimal HBM traffic."""
    from blvm_tpu.models.wavenet.modules import ResidualStack

    dilations = ResidualStack.build_dilations(n_layers, n_stacks, base_dilation)
    rf = ResidualStack.compute_receptive_fields(n_layers, n_stacks, kernel_size, base_dilation)[-1]
    L = T + rf  # model pads the receptive field once up front

    bpe = 2  # bf16
    half = C  # gate half-width == res_channels at this config
    skip = C

    flops = 0.0
    flops_padded = 0.0
    fwd_bytes = 0.0
    bwd_bytes = 0.0

    # in_transform 1x1 conv (C -> C) over padded length
    flops += 2 * B * L * C * C
    flops_padded += 2 * B * L * pad_lane(C) * pad_lane(C)
    fwd_bytes += B * L * pad_lane(C) * bpe * 2  # read x, write o

    L_in = L
    for d in dilations:
        L_out = L_in - d
        # two branch gate convs: k taps each, C -> half
        f_gate = 2 * (kernel_size * 2 * B * L_in * C * half)
        f_gate_p = 2 * (kernel_size * 2 * B * L_in * pad_lane(C) * pad_lane(half))
        # rs 1x1: half -> C + skip
        f_rs = 2 * B * L_out * half * (C + skip)
        f_rs_p = 2 * B * L_out * pad_lane(half) * (pad_lane(C) + pad_lane(skip))
        flops += f_gate + f_rs
        flops_padded += f_gate_p + f_rs_p

        row = lambda Lx, Cx: B * Lx * pad_lane(Cx) * bpe
        # minimal forward traffic: read input once; write what backward needs
        fwd_bytes += row(L_in, C)  # read x
        fwd_bytes += 2 * row(L_out, half)  # write tanh/sigmoid pre-activations
        fwd_bytes += row(L_out, half)  # write gated activation (rs operand)
        fwd_bytes += row(L_out, C)  # write residual out
        fwd_bytes += row(T + 1, skip)  # write skip slice
        # minimal backward: read saved tensors + incoming grad, write input grad
        bwd_bytes += row(L_in, C)  # re-read x (gate weight grads)
        bwd_bytes += 2 * row(L_out, half)  # read pre-activations
        bwd_bytes += row(L_out, half)  # read act (rs weight grad)
        bwd_bytes += row(L_out, C)  # read incoming residual grad
        bwd_bytes += row(T + 1, skip)  # read skip grad (broadcast of sum grad)
        bwd_bytes += row(L_in, C)  # write input grad
        L_in = L_out

    # skip-sum + output head (ReLU-Dense-ReLU -> DMoL params), f32 region
    n_blocks = len(dilations)
    flops += 2 * B * T * C * out_features
    flops_padded += 2 * B * T * pad_lane(C) * pad_lane(out_features)
    fwd_bytes += n_blocks * B * (T + 1) * pad_lane(skip) * bpe  # read skips for the sum
    fwd_bytes += B * T * pad_lane(C) * 4 * 2  # f32 skip-sum write + head read

    # backward ~ 2x forward FLOPs (grad wrt inputs + grad wrt weights)
    train_flops = 3 * flops
    train_flops_padded = 3 * flops_padded
    total_bytes = fwd_bytes + bwd_bytes

    return {
        "rf": rf,
        "n_blocks": n_blocks,
        "train_flops": train_flops,
        "train_flops_padded": train_flops_padded,
        "min_hbm_bytes": total_bytes,
        "compute_floor_ms": train_flops / PEAK_FLOPS_BF16 * 1e3,
        "compute_floor_padded_ms": train_flops_padded / PEAK_FLOPS_BF16 * 1e3,
        "memory_floor_ms": total_bytes / PEAK_HBM * 1e3,
    }


NEGATIVE_LEVERS = [
    ("baseline (bench.py flagship, bf16, monolithic)", 54.9, "2.33M samples/s, temp alloc 9.23 GB"),
    ("gradient accumulation accum=2 (POSITIVE; bench default)", 46.2, "2.77M samples/s - capacity relief, same update"),
    ("remat residual blocks", 61.8, "recompute traffic exceeds saved-activation traffic"),
    ("res_channels 96->128 (MXU lane pad)", 118.6, "temp 12.05 GB; capacity-induced remat dominates"),
    ("batch 8->16", 173.4, "temp 15.62 GB > 16 GB HBM; heavy remat"),
    ("4-way fused gate dots", 72.2, "defeats output-slice overlap of the k=2 lowering"),
    ("Pallas fused block stack", float("nan"), "cut round-2: wedges the device via the relay"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true", help="time the real step on the attached chip")
    ap.add_argument("--negative-levers", action="store_true", help="print the measured-negative lever table")
    args = ap.parse_args()

    m = analytic_model()
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in m.items()}, indent=2))

    if args.negative_levers:
        print("\nmeasured-negative levers (v5e, flagship config):")
        for name, ms, why in NEGATIVE_LEVERS:
            ms_s = f"{ms:7.1f} ms" if not math.isnan(ms) else "   (cut)  "
            print(f"  {ms_s}  {name}: {why}")

    if args.measure:
        import time

        import jax
        import jax.numpy as jnp
        import numpy as np

        from blvm_tpu.models import WaveNet
        from blvm_tpu.parallel import make_mesh, make_train_step
        from blvm_tpu.training import TrainState, get_optimizer

        make_mesh(1)
        B, T = 8, 16000
        model = WaveNet(n_layers=10, n_stacks=5, res_channels=96, num_mix=10, num_bins=2**16, bf16=True)
        rng = np.random.default_rng(0)
        batches = [
            {"x": jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32), "x_sl": jnp.full((B,), T, jnp.int32)}
            for _ in range(4)
        ]
        v = jax.jit(
            lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, batches[0]["x"], batches[0]["x_sl"])
        )(jax.random.PRNGKey(0))
        state = TrainState.create(
            apply_fn=model.apply, params=v["params"], tx=get_optimizer("Adam", 3e-4), rng=jax.random.PRNGKey(2)
        )

        def loss_fn(params, rng_key, batch, scalars):
            loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng_key})
            return loss, (mets, None)

        step = make_train_step(loss_fn)
        for i in range(2):
            state, mets = step(state, batches[i % 4], {})
            float(jax.device_get(mets["loss"]))

        # Time BEFORE any cost/memory analysis: running ``.lower().compile()``
        # + ``cost_analysis()`` against the axon relay knocks it out of async
        # dispatch for the rest of the process — measured 111-249 ms/step for
        # the identical program that times at ~55 ms/step when the analysis
        # runs after the loop (three corrupted measurements in round 3 before
        # this was isolated; bench.py, which never calls cost_analysis,
        # measured 54.5 ms in the same process queue).
        def timed(n):
            nonlocal state
            t0 = time.perf_counter()
            for i in range(n):
                state, mets = step(state, batches[i % 4], {})
            float(jax.device_get(mets["loss"]))
            return (time.perf_counter() - t0) / n * 1e3

        per_ms_a = timed(10)
        per_ms = timed(50)
        linear = abs(per_ms_a - per_ms) <= 0.25 * max(per_ms_a, per_ms)
        print(f"measured: {per_ms:.2f} ms/step -> {B*T/per_ms*1e3:,.0f} samples/s (linearity {'OK' if linear else 'FAILED'})")

        compiled = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(state, batches[1], {}).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        mem = compiled.memory_analysis()
        print(
            f"XLA cost model: flops={ca.get('flops', 0)/1e12:.3f} T  "
            f"bytes={ca.get('bytes accessed', 0)/1e9:.1f} GB (pre-fusion overcount)  "
            f"temp alloc={mem.temp_size_in_bytes/1e9:.2f} GB"
        )
        print(
            f"attainment: {100*m['compute_floor_ms']/per_ms:.1f}% of compute ceiling "
            f"({100*m['compute_floor_padded_ms']/per_ms:.1f}% counting forced lane padding), "
            f"{100*m['memory_floor_ms']/per_ms:.1f}% of the minimal-traffic memory ceiling"
        )


if __name__ == "__main__":
    main()
