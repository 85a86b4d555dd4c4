"""Roofline/floor analysis for the recurrent scan families (VERDICT round-4 #6).

Answers "is 9.9 ms for 250 sequential VRNN cell steps actually fast?" with a
measured serial-latency floor instead of vibes, for the four bench lines whose
step time is dominated by `lax.scan` over a recurrent cell: LSTM, VRNN, SRNN,
and the CTC probe. (WaveNet/STCN have their own conv roofline in
`roofline_wavenet.py`; CWVAE is depthwise-conv dominated — its RSSM scans are
273 fwd+bwd iterations, < 0.6 ms of serial floor against a 16 ms step — so it
is excluded here.)

Reference context: these families are the reference's per-timestep Python
loops (``blvm/models/vrnn.py:306-308``, ``blvm/models/srnn.py:224-253``,
cuDNN LSTM at ``blvm/models/lstm.py:46``); SURVEY §3.1 flags the loops as the
reference's dominant inefficiency. Our scans already beat the reference
throughput targets by 26-195x, so this analysis is hardening: it bounds how
much is left.

## Floor model

A train step for these models is three strictly ordered phases —
time-parallel pre-work (encoders, input projections), the serial scan(s), and
time-parallel post-work (decoders, likelihood) — plus the reverse-mode mirror
of each. Dependences force the phases to run in sequence, so a defensible
lower bound is the SUM of per-phase floors:

  floor_ms = n_serial_iters_total * tau_iter  +  nonscan_train_flops / peak

* ``tau_iter`` is the MEASURED minimal per-iteration latency of a
  dependency-carrying scan on this backend: a fwd+bwd chain of single
  (8,256)@(256,256) matmuls timed over 500 iterations. Measured 2.13 us/iter
  on v5e-via-relay (``--calibrate`` re-measures). This is a true floor for
  any scan body: every iteration must at least dispatch one dependent fused
  computation.
* ``n_serial_iters_total`` counts every sequential iteration the model's
  structure forces: each layer's/direction-group's scan, forward and reverse
  (autodiff replays the chain), plus the CTC alpha recursion for the probe.
* ``nonscan_train_flops`` is the analytic MXU work of the parallel phases
  (3x forward for fwd+bwd+weight-grads) at the chip's dense peak. In-loop
  matmul FLOPs are NOT added — at these shapes they ride far below the
  per-iteration latency and adding them would double-count.

What the floor deliberately ignores (and why the gap above it is structural):
the calibration body is ONE small matmul, while the real cells run 1-14
dependent matmuls forward and ~2x that backward. The ``--calibrate`` K-curve
quantifies the marginal cost: at (8,512)x(512,512), best-of-3 per-iteration
time grows from ~3.4 us at K=1 to ~6.2 us at K=8 dependent matmuls — ~0.4 us
per extra serial matmul. Note 8 x 1 MB of weights per iteration at 6.2 us
would exceed HBM peak, so the loop-invariant weights are VMEM-resident
(9.8 MB of VRNN cell weights fit v5e's 128 MB VMEM easily): the residual
above the floor is dependent-matmul ISSUE LATENCY, not weight bandwidth.
That is why VRNN — 14 matmuls fwd, ~28 bwd — sits farthest above the floor,
and why its measured forward scan (~2.1 ms incl. parallel work) is 4x
cheaper than its backward (~7.6 ms at unroll=1): the backward body is twice
as wide and carries the grad accumulators.

## Round-5 conclusions recorded from this script on v5e (NOTES.md table)

  family  measured(best)  floor   attain  n_iters  dominant residual
  lstm     5.38 ms        1.33 ms  25%      512     bwd body + 50 GF head phases
  vrnn     6.93 ms        1.11 ms  16%      500     28-matmul bwd body, 9.8 MB/iter weights
  srnn     6.81 ms        3.30 ms  48%     1500     3 serial scans; latent-chain bwd
  ctc     ~9.99 ms        6.61 ms  66%     3000     near-floor; 2 biLSTM layers + alpha recursion

Measured levers (``--levers``):
  POSITIVE  scan unroll=8 (adopted in bench.py + --scan_unroll driver flag):
              vrnn 9.87 -> 6.93 ms (1.42x), srnn 8.95 -> 6.81 ms (1.31x).
              Unrolling amortizes loop bookkeeping and lets XLA overlap
              weight loads across iterations. Same math — equivalence-tested
              in tests/models/test_scan_unroll.py.
  POSITIVE  batch 8 -> 32 for SRNN: 32.3M samples/s vs 18.8M (1.72x
              per-sample) — SRNN's three thin scans are latency-bound, so
              widening the batch is nearly free. (Bench line stays at B=8 =
              the reference-parity config; the lever is for production runs.)
  NEGATIVE  batch 8 -> 32 for VRNN: 17.9M vs 18.7M samples/s — the wide
              cell body is already bandwidth-bound per iteration; 4x batch
              costs 4.1x time.
  NEGATIVE  unroll=8 for the CTC probe: 9.99 -> 10.99 ms — already 66% of
              floor; unrolling inflates the direction-batched einsum body.
  NEUTRAL   unroll for LSTM audio: 5.90 vs 5.90 ms at the flagship config
              (the 50 GF parallel head phases dominate, not the scan).
  NEGATIVE  heavy unroll on a minimal body: the calibration chain itself
              gets SLOWER fwd+bwd with unroll (2.13 -> 5.0 us/iter at u=8) —
              unroll only pays when the body has work to overlap.

Run ``--calibrate`` / ``--measure`` / ``--levers`` on a chip; with no flags
the analytic floor table prints from the recorded calibration constants.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

PEAK_FLOPS = 197e12  # v5e dense bf16/f32-on-MXU peak used across this repo
TAU_ITER_US = 2.13  # measured minimal per-iteration fwd+bwd scan latency (v5e, --calibrate)


def _family_models():
    """Serial-iteration inventory + analytic non-scan FLOPs per bench config.

    Counts are walked from the model structure (file:line refs inline);
    FLOPs are 2*M*N*K per matmul, x3 for training (fwd + input-grads +
    weight-grads).
    """
    fams = {}

    # LSTM audio (bench: B=32, T=16384, stack 64 -> T'=256, H=256, 1 layer)
    B, Tp, S, H, mix = 32, 256, 64, 256, 10
    emb = S * H + 2 * H * H  # models/lstm.py embedding MLP
    xw = H * 4 * H  # time-parallel input projection (modules/recurrent.py:88)
    dec = 2 * H * H + H * 3 * mix * S  # decoder MLP to DMoL params
    fams["lstm"] = dict(
        iters=2 * 1 * Tp,  # 1 layer, fwd + autodiff reverse
        nonscan_train_flops=3 * 2 * B * Tp * (emb + xw + dec),
        serial_matmuls_fwd=1,  # h @ w_hh (modules/recurrent.py:94)
        inloop_weight_bytes=4 * H * 4 * H * 4,
        measured_best_ms=5.38,
    )

    # VRNN audio (bench: B=8, T=16000 -> T'=250, H=256, z=64, r=512)
    B, Tp, S, H, z, r = 8, 250, 64, 256, 64, 512
    enc = S * H + 2 * H * H  # _StackedEncoder (models/vrnn.py:345-355)
    dec = (H + r) * H + H * H + H * S * 30  # _UnstackingDecoder, DMoL 30 params
    # in-loop (models/vrnn.py:57-92): prior MLP3+head, posterior MLP3+head,
    # phi_z MLP4, GRU w_ih+w_hh = 14 matmuls
    cell_weights = (r * H + 2 * H * H + H * 2 * z) + ((r + H) * H + 2 * H * H + H * 2 * z) + (z * H + 3 * H * H) + (
        (H + H) * 3 * r + r * 3 * r
    )
    fams["vrnn"] = dict(
        iters=2 * Tp,
        nonscan_train_flops=3 * 2 * B * Tp * (enc + dec),
        serial_matmuls_fwd=14,
        inloop_weight_bytes=cell_weights * 4,
        measured_best_ms=6.93,
    )

    # SRNN audio (bench: B=8, T'=250, H=256, z=64, r=512; smoothing, ungated)
    enc = S * H + 2 * H * H
    d_proj = H * 3 * r  # d-GRU time-parallel input projection
    a_proj = (H + r) * 3 * r  # a-GRU over concat(enc, d)
    dec = (z + r) * H + H * H + H * S * 30
    # latent chain in-loop (models/srnn.py:87-92): prior MLP3+head + posterior
    # MLP3+head = 8 matmuls; GRU in-loop: h @ w_hh each
    fams["srnn"] = dict(
        iters=2 * 3 * Tp,  # three serial scans (d-GRU, a-GRU, latent), fwd+bwd
        nonscan_train_flops=3 * 2 * B * Tp * (enc + d_proj + a_proj + dec),
        serial_matmuls_fwd=8,
        inloop_weight_bytes=(2 * (r * 3 * r) + 2 * ((r + z) * H + 2 * H * H + H * 2 * z)) * 4,
        measured_best_ms=6.81,
    )

    # CTC probe (bench: B=16, T=500, D=80, H=256, V=30, 2-layer fused biLSTM)
    B, T, D, H, V = 16, 500, 80, 256, 30
    l1_proj = 2 * D * 4 * H  # both directions (modules/lstm_block.py:111)
    l2_proj = 2 * (2 * H) * 4 * H
    head = 2 * H * V
    fams["ctc"] = dict(
        iters=2 * 2 * T + 2 * T,  # two fused-direction layer scans fwd+bwd + alpha recursion fwd+bwd
        nonscan_train_flops=3 * 2 * B * T * (l1_proj + l2_proj + head),
        serial_matmuls_fwd=1,  # direction-batched einsum (lstm_block.py:118)
        inloop_weight_bytes=2 * 2 * H * 4 * H * 4,
        measured_best_ms=9.99,
    )
    return fams


def floor_table(tau_us=TAU_ITER_US):
    rows = {}
    for name, f in _family_models().items():
        serial_ms = f["iters"] * tau_us * 1e-3
        mxu_ms = f["nonscan_train_flops"] / PEAK_FLOPS * 1e3
        floor = serial_ms + mxu_ms
        rows[name] = {
            "iters": f["iters"],
            "serial_floor_ms": round(serial_ms, 3),
            "nonscan_mxu_floor_ms": round(mxu_ms, 3),
            "floor_ms": round(floor, 3),
            "measured_best_ms": f["measured_best_ms"],
            "attainment_pct": round(100 * floor / f["measured_best_ms"], 1),
            "serial_matmuls_fwd": f["serial_matmuls_fwd"],
            "inloop_weight_mb": round(f["inloop_weight_bytes"] / 1e6, 2),
        }
    return rows


def _timeit(f, *args, n=40, rounds=3):
    """Best-of-``rounds`` mean over ``n`` async-chained calls.

    The relay's host->device queue adds multi-us jitter to these us-scale
    chains, so a single mean can be 2-5x the true device time; the floor
    constants must be the fastest observed (a floor built on a slow sample
    would overstate attainment).
    """
    import time

    import jax

    float(jax.device_get(f(*args)))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        float(jax.device_get(r))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def calibrate():
    """Measure tau_iter and the K-curve on the attached backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = {}
    rng = np.random.default_rng(0)

    # tau_iter: minimal fwd+bwd dependent chain, H=256
    B, H, T = 8, 256, 250
    W = jnp.asarray(rng.normal(size=(H, H)) * 0.01, jnp.float32)
    h0 = jnp.ones((B, H), jnp.float32)

    @jax.jit
    def fwdbwd(h0, W):
        def f(W):
            def body(h, _):
                return jnp.tanh(h @ W), ()

            h, _ = jax.lax.scan(body, h0, None, length=T)
            return h.sum()

        return jax.grad(f)(W).sum()

    ms = _timeit(fwdbwd, h0, W)
    out["tau_iter_us"] = round(ms / (2 * T) * 1e3, 3)

    # K-curve: forward chains of K dependent (8,512)x(512,512) matmuls
    H = 512
    Ws = [jnp.asarray(rng.normal(size=(H, H)) * 0.01, jnp.float32) for _ in range(8)]
    h0 = jnp.ones((B, H), jnp.float32)
    kcurve = {}
    for K in (1, 2, 4, 8):

        @jax.jit
        def fwd(h0, Ws, K=K):
            def body(h, _):
                for k in range(K):
                    h = jnp.tanh(h @ Ws[k])
                return h, ()

            h, _ = jax.lax.scan(body, h0, None, length=T)
            return h.sum()

        kcurve[K] = round(_timeit(fwd, h0, Ws[:K]) / T * 1e3, 2)
    out["kcurve_us_per_iter"] = kcurve

    # unroll curve on the same K=1 H=512 chain
    ucurve = {}
    for u in (1, 4, 16):

        @jax.jit
        def fwd(h0, W, u=u):
            def body(h, _):
                return jnp.tanh(h @ W), ()

            h, _ = jax.lax.scan(body, h0, None, length=T, unroll=u)
            return h.sum()

        ucurve[u] = round(_timeit(fwd, h0, Ws[0]) / T * 1e3, 2)
    out["unroll_curve_us_per_iter"] = ucurve
    return out


def measure():
    """Time the four family steps at the adopted bench configs, report attainment."""
    import bench  # repo-root bench.py: reuses the exact flagship builders
    import jax

    from blvm_tpu.parallel import make_mesh, make_train_step
    from blvm_tpu.training import TrainState, get_optimizer

    make_mesh(1)
    floors = floor_table()
    results = {}
    for name, builder in [
        ("lstm", bench.build_lstm),
        ("vrnn", bench.build_vrnn),
        ("srnn", bench.build_srnn),
        ("ctc", bench.build_ctc),
    ]:
        model, loss_fn, batches, spb, dtype = builder(False)
        first = batches[0]
        init_rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
        if name == "ctc":
            v = jax.jit(lambda k: model.init(init_rngs, first["x"], first["x_sl"], first["y"], first["y_sl"]))(0)
        else:
            v = jax.jit(lambda k: model.init(init_rngs, first["x"], first["x_sl"]))(0)
        state = TrainState.create(
            apply_fn=model.apply, params=v["params"], tx=get_optimizer("Adam", 3e-4), rng=jax.random.PRNGKey(2)
        )
        step = make_train_step(loss_fn)

        def run_once(state, i):
            return step(state, batches[i % len(batches)], {})

        for i in range(3):
            state, mets = run_once(state, i)
        float(jax.device_get(mets["loss"]))
        import time

        t0 = time.perf_counter()
        n = 50
        for i in range(n):
            state, mets = run_once(state, i)
        float(jax.device_get(mets["loss"]))
        ms = (time.perf_counter() - t0) / n * 1e3
        fl = floors[name]
        results[name] = {
            "measured_ms": round(ms, 3),
            "floor_ms": fl["floor_ms"],
            "attainment_pct": round(100 * fl["floor_ms"] / ms, 1),
            "samples_per_sec": round(spb / ms * 1e3),
            "dtype": dtype,
        }
        print(f"{name}: {ms:.3f} ms vs floor {fl['floor_ms']} ms -> {results[name]['attainment_pct']}%", flush=True)
    return results


LEVERS = [
    ("POSITIVE", "scan unroll=8 (ADOPTED: bench.py + --scan_unroll)", "vrnn 9.87->6.93 ms (1.42x); srnn 8.95->6.81 ms (1.31x)"),
    ("POSITIVE", "batch 8->32 for SRNN", "32.3M vs 18.8M samples/s (1.72x per-sample; latency-bound scans amortize)"),
    ("NEGATIVE", "batch 8->32 for VRNN", "17.9M vs 18.7M samples/s (cell body already bandwidth-bound; 4x batch = 4.1x time)"),
    ("NEGATIVE", "unroll=8 for the CTC probe", "9.99->10.99 ms (already 66% of floor; einsum body inflates)"),
    ("NEUTRAL ", "unroll for LSTM audio", "5.90 vs 5.90 ms (parallel head phases dominate the step)"),
    ("NEGATIVE", "heavy unroll on a minimal body", "calibration chain 2.13->5.0 us/iter at u=8 (nothing to overlap)"),
    ("NEGATIVE", "bf16 head phases for LSTM audio (scan core f32)", "5.97->7.31 ms (converts outweigh the halved traffic; consistent with the round-2 full-bf16 finding)"),
    ("NEGATIVE", "block-packed VRNN cell (prior||posterior tracks + GRU gi||gh as block matmuls, 14 -> 9 MXU ops/iter)", "scan-only fwd+bwd 4.31 -> 5.56 ms at unroll=8 (fwd 2.21 -> 2.11): the zero blocks double the backward matmul traffic, outweighing the op-count cut"),
    ("MIXED   ", "batch widening for LSTM audio (32 -> 64 -> 128)", "85.2M / 111.1M samples/s vs 97.3M at B=32 — non-monotonic (B=64 loses to layout/capacity effects, B=128 recovers to 1.14x); bench line stays at the reference-parity B=32"),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--calibrate", action="store_true", help="measure tau_iter / K-curve / unroll curve on the chip")
    ap.add_argument("--measure", action="store_true", help="time the four family steps and report attainment")
    ap.add_argument("--levers", action="store_true", help="print the measured lever table")
    args = ap.parse_args()

    print(json.dumps({"floor_table_at_recorded_tau": floor_table()}, indent=2))
    if args.calibrate:
        print(json.dumps({"calibration": calibrate()}, indent=2))
    if args.levers:
        print("\nmeasured levers (v5e, flagship configs):")
        for sign, name, detail in LEVERS:
            print(f"  {sign}  {name}: {detail}")
    if args.measure:
        print()
        print(json.dumps({"measured": measure()}, indent=2))


if __name__ == "__main__":
    main()
