"""Benchmark: training throughput of the blvm_tpu model families on one chip.

Default (the driver contract): ONE JSON line for the flagship WaveNet train
step — {"metric", "value", "unit", "vs_baseline", ...extras}.

``--all`` (or ``--families a,b,c``): one JSON line per family, same
measurement discipline, replacing the hand-run NOTES.md throughput table with
a reproducible script (so regressions in the non-flagship families are
detectable round over round).

``--f32`` forces float32 everywhere; the default dtype per family is the
shipped production choice — bf16 residual/conv stacks for WaveNet/STCN/CWVAE
(measured 1.95×/1.68×/1.63× at equal loss, NOTES.md), f32 for the recurrent
scan cores (bf16 scans measured 10× slower on this backend).

Metric: waveform samples consumed per second by full training steps (forward +
backward + Adam update). Flagship config = the benchmarks.txt canonical TIMIT
WaveNet (n_stacks 5, n_layers 10, res_channels 96, DMoL 2^16 bins,
16000-sample segments). Baseline for vs_baseline: the BASELINE.json north star
of 5x a reference single-GPU throughput; the reference repo records no
absolute numbers (BASELINE.md), so vs_baseline reports value / 500_000.

Measurement integrity (round-2 rework — the round-1 number implied >4x chip
peak and was an async-dispatch artifact of the experimental TPU relay):
  * every timed step consumes a DIFFERENT batch (no constant-folding headroom),
  * timing is closed by ``jax.device_get`` of the final loss scalar — the
    float must physically arrive on the host, which transitively forces every
    step (params chain step-to-step), unlike ``block_until_ready`` which the
    relay can acknowledge early,
  * two step counts are timed and per-step times must agree (linearity); if
    they disagree (or the implied FLOP/s exceeds the chip's bf16 peak) the
    script re-measures as a single scan-chain dispatch, then per-step-synced
    timing (a strict lower bound),
  * EVERY family's implied FLOP/s is checked against hardware peak using the
    exact MXU FLOP count traced from the jaxpr (utils/flops.py — scan trip
    counts multiplied out); if even the final mode exceeds peak, the
    measurement is impossible and the script fails loudly,
  * first/last timed losses are reported so training progress is visible.

Flagship status (round-4 closure of the round-2 "done" bar): the WaveNet step
is 40.9 ms vs the committed 32.3 ms minimal-traffic memory floor
(scripts/perf/roofline_wavenet.py) — 79% of the memory-bound ceiling. Every
single-knob XLA lever was measured (NOTES.md round-3: batch, remat, accum
scan/unroll 1/2/4/8, channel padding, layout) and the remaining 8.6 ms is a
50-deep serial chain of small fused ops closable only by a hand-scheduled
multi-block kernel. Both Pallas variants fault the v5e through the
experimental relay (device wedged ~1h per attempt, NOTES.md round-2 "Pallas
CUT"), so 79%-of-ceiling is recorded as FINAL on this backend; revisit from
commit 1788a18^ if/when the relay supports direct Mosaic debugging.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE = 500_000.0  # 5x reference single-GPU target (BASELINE.json)

# Known chip peaks (dense matmul FLOP/s). bf16 peak is used as the generous
# upper bound for the plausibility assert even for f32 runs.
PEAKS_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}
DEFAULT_PEAK = 197e12  # assume v5e-class if unrecognized


# -- flagship WaveNet config (benchmarks.txt canonical TIMIT WaveNet) ---------
WN_LAYERS, WN_STACKS, WN_RES, WN_MIX, WN_BINS = 10, 5, 96, 10, 2**16
WN_B, WN_T = 8, 16000  # WN_B overridable with --wn_batch (reference default budget is B=16)
WN_S = 1  # --wn_stack_frames: benchmarks.txt grid s in {1, 64, 256} (s>1 uses T=65536)


def wavenet_analytic_flops() -> tuple[float, float]:
    """(forward_lower_bound, train_estimate) FLOPs per flagship train step.

    Counts only the MXU work (convs/denses; 2 FLOPs per MAC). The dilated
    convs run over the receptive-field-padded sequence, each block's output
    shrinking by its dilation; counting all 50 blocks at output length T is a
    strict LOWER bound on the forward cost. Train estimate = 3x forward
    (standard fwd:bwd = 1:2 for conv/matmul nets).

    Frame stacking (``WN_S > 1``) runs the convs at T/s frames of s-sample
    vectors: the causal conv reads s input channels, the PointwiseTransform
    head widens to res*s, and the DMoL dense runs per *waveform* frame after
    unstacking (``wavenet.py`` setup/forward).
    """
    conv_t = WN_B * WN_T // WN_S  # conv-stack frames per step (skip_size == T/s)
    gate = 2 * 2 * WN_RES * (2 * WN_RES)  # k=2 conv RES -> 2*RES
    rs = 2 * WN_RES * (2 * WN_RES)  # 1x1 conv RES -> RES+RES
    per_block = gate + rs
    blocks = WN_LAYERS * WN_STACKS * per_block
    causal = 2 * 2 * WN_S * WN_RES  # k=2 conv, s stacked input channels
    head = 2 * WN_RES * (WN_RES * WN_S)  # PointwiseTransform dense res -> res*s
    lik_per_frame = 2 * WN_RES * (3 * WN_MIX)  # DMoL parameter dense (per waveform frame)
    fwd = conv_t * (blocks + causal + head) + WN_B * WN_T * lik_per_frame
    return float(fwd), float(3 * fwd)


# ---------------------------------------------------------------------------
# family workload builders — each returns
#   (model, loss_fn, batches, samples_per_step, dtype_str)
# with shapes matching the NOTES.md round-2 measurement table
# ---------------------------------------------------------------------------


def _audio_batches(B, T, n=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {"x": jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32), "x_sl": jnp.full((B,), T, jnp.int32)}
        for _ in range(n)
    ]


def _simple_loss(model, **kw):
    def loss_fn(params, rng_key, batch, scalars):
        loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"], **kw, rngs={"sample": rng_key})
        return loss, (mets, None)

    return loss_fn


REMAT = False  # set by --remat: rematerialize residual blocks in the backward
ACCUM = 1  # set by --accum: gradient-accumulation microbatches (exact frames-weighted update)
ACCUM_UNROLL = False  # set by --accum_unroll: unrolled (scheduler-interleavable) microbatches

# Capacity-bound steps run FASTER split into accumulated microbatches with
# ONE frames-weighted optimizer update — the same math, measured equal loss:
#   STCN (temp alloc 13 GB of 16 GB, spills): 170.9 -> 98.3 ms at accum=8
#     (accum 2/4: 131/102 ms; UNROLLED accum 4/8: 112/120 ms — unrolling
#     reintroduces the capacity pressure, scan stays the STCN default);
#   WaveNet flagship (9.2 GB temp): 54.5 -> 46.2 ms at scan accum=2; the
#     UNROLLED microbatch graph (no scan barrier, chains interleaved by the
#     scheduler) then wins: accum 2/4/8 unrolled = 42.5/40.9/55.6 ms, so the
#     production default is accum=4 unrolled = 3.13M samples/s, 26.5% MFU.
# Production defaults per family; --accum / --accum_unroll override.
FAMILY_ACCUM_DEFAULTS = {"stcn": 8, "wavenet": 4}
FAMILY_UNROLL_DEFAULTS = {"wavenet": True}


def build_wavenet(bf16):
    from blvm_tpu.models import WaveNet

    model = WaveNet(
        n_layers=WN_LAYERS, n_stacks=WN_STACKS, res_channels=WN_RES, num_mix=WN_MIX, num_bins=WN_BINS,
        n_stack_frames=WN_S, bf16=bf16, remat=REMAT,
    )
    dtype = ("bf16" if bf16 else "f32") + ("+remat" if REMAT else "") + (f"+accum{ACCUM}" if ACCUM > 1 else "") + ("+unroll" if (ACCUM_UNROLL and ACCUM > 1) else "") + (f"+s{WN_S}" if WN_S > 1 else "")
    return model, _simple_loss(model), _audio_batches(WN_B, WN_T), WN_B * WN_T, dtype


def build_lstm(bf16):
    from blvm_tpu.models import LSTMAudio

    B, T = 32, 16384
    model = LSTMAudio(stack_size=64, hidden_size=256, num_mix=10, num_bins=WN_BINS)
    return model, _simple_loss(model), _audio_batches(B, T), B * T, "f32"  # scan cores stay f32


def build_vrnn(bf16):
    from blvm_tpu.models import VRNNAudio

    B, T = 8, 16000
    # unroll=8: the time scan is per-iteration-latency bound; measured
    # 9.87 -> 6.93 ms on this config (scripts/perf/roofline_scan.py --levers)
    model = VRNNAudio(likelihood="DMoL", input_size=64, hidden_size=256, latent_size=64, num_bins=WN_BINS, unroll=8)
    return model, _simple_loss(model), _audio_batches(B, T), B * T, "f32+unroll8"


def build_srnn(bf16):
    from blvm_tpu.models import SRNNAudio

    B, T = 8, 16000
    # unroll=8: three serial scans, all per-iteration-latency bound; measured
    # 8.95 -> 6.81 ms on this config (scripts/perf/roofline_scan.py --levers)
    model = SRNNAudio(likelihood="DMoL", input_size=64, hidden_size=256, latent_size=64, num_bins=WN_BINS, unroll=8)
    return model, _simple_loss(model), _audio_batches(B, T), B * T, "f32+unroll8"


def build_cwvae(bf16):
    from blvm_tpu.models import CWVAEAudio

    B, T = 8, 16384
    # unroll=8 on the level scans: 16.1 -> 14.1 ms measured on this config
    # (roofline_scan.py lever family; same math, equivalence-tested)
    model = CWVAEAudio(z_size=64, h_size=128, strides=(64, 16, 16), likelihood="DMoL", num_bins=WN_BINS, bf16=bf16, unroll=8)
    return model, _simple_loss(model, pad_strideable=True), _audio_batches(B, T), B * T, (
        ("bf16" if bf16 else "f32") + "+unroll8"
    )


def build_stcn(bf16):
    from blvm_tpu.models import STCN

    B, T = 8, 16000
    model = STCN(n_layers=5, latent_size=(256, 128, 64, 32, 16), res_channels=256, bf16=bf16, remat=REMAT)
    dtype = ("bf16" if bf16 else "f32") + ("+remat" if REMAT else "") + (f"+accum{ACCUM}" if ACCUM > 1 else "") + ("+unroll" if (ACCUM_UNROLL and ACCUM > 1) else "")
    return model, _simple_loss(model), _audio_batches(B, T), B * T, dtype


def build_ctc(bf16):
    from blvm_tpu.models import SimpleLSTMASR

    B, T, D, N, V = 16, 500, 80, 50, 30
    vocab = tuple("%abcdefghijklmnopqrstuvwxyz '-_"[:V])
    model = SimpleLSTMASR(vocab=vocab, input_size=D, hidden_size=256, num_layers=2, bidirectional=True)
    rng = np.random.default_rng(0)
    batches = [
        {
            "x": jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32),
            "x_sl": jnp.full((B,), T, jnp.int32),
            "y": jnp.asarray(rng.integers(1, V, (B, N)), jnp.int32),
            "y_sl": jnp.full((B,), N, jnp.int32),
        }
        for _ in range(4)
    ]

    def loss_fn(params, rng_key, batch, scalars):
        loss, mets, _ = model.apply({"params": params}, batch["x"], batch["x_sl"], batch["y"], batch["y_sl"])
        # only the scalar loss is timed (decode/WER are host-side by design)
        return loss, ({"loss": loss}, None)

    return model, loss_fn, batches, B * T, "f32"


FAMILIES = {
    "wavenet": build_wavenet,
    "lstm": build_lstm,
    "vrnn": build_vrnn,
    "srnn": build_srnn,
    "cwvae": build_cwvae,
    "stcn": build_stcn,
    "ctc": build_ctc,
}


# ---------------------------------------------------------------------------
# measurement harness
# ---------------------------------------------------------------------------


def time_steps(step, state, batches, schedules, n_steps, sync_every_step):
    """Run n_steps and return (state, dt, loss_first, loss_last)."""
    n_distinct = len(batches)
    first_loss = None
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, mets = step(state, batches[i % n_distinct], schedules)
        if first_loss is None:
            first_loss = mets["loss"]
        if sync_every_step:
            float(jax.device_get(mets["loss"]))
    last = float(jax.device_get(mets["loss"]))  # forces the whole chain
    dt = time.perf_counter() - t0
    return state, dt, float(jax.device_get(first_loss)), last


def scan_chain_times(loss_fn, state, batches, steps_a, steps_b):
    """Scan-chain timing at two lengths; returns (state, per_step, linear, lf, ll).

    Linearity is judged between the two chain lengths IN scan mode (round-3
    verdict #2: the committed LSTM line carried ``timing_linear: false`` from
    the async mode even though its reported number came from the scan chain).
    Chains shorter than half the long one pay a visible fixed dispatch cost
    (~10-20 ms per chain on the relay) that fails the 25% gate for fast steps,
    so the short chain is at least steps_b/2 and fast steps lengthen both.
    """
    if steps_b * 0.020 < 2.0:  # fast steps: amortize the per-chain dispatch cost
        steps_b = max(steps_b, 200)
    steps_a = max(steps_a, steps_b // 2)
    state, per_a, _, _ = scan_chain_time(loss_fn, state, batches, steps_a)
    state, per_b, lf, ll = scan_chain_time(loss_fn, state, batches, steps_b)
    linear = abs(per_a - per_b) <= 0.25 * max(per_a, per_b)
    return state, per_b, linear, lf, ll


def scan_chain_time(loss_fn, state, batches, n_steps):
    """Time n_steps train steps embedded in ONE jitted ``lax.scan``.

    For fast-step families the per-step relay dispatch cost dominates both
    async-chain and per-step-sync timing (measured: the 7 ms LSTM step reads
    as ~38 ms under per-step sync). A scan chain is a single dispatch whose
    device program contains all n_steps updates, closed by device_get of the
    per-step loss vector — it cannot be inflated by async artifacts (the work
    physically completed) and carries no per-step host cost. This is also the
    shape of a real TPU training loop (dispatch pipelining hides per-step
    latency), so it is the number a user would see in production.

    Returns (state, per_step_seconds, loss_first, loss_last).
    """
    from blvm_tpu.parallel import make_train_step

    # same step configuration as the async-timed step (accumulation included)
    # — the scan chain must re-measure the SAME program, not a monolithic one
    raw_step = make_train_step(
        loss_fn,
        jit=False,
        accum=ACCUM,
        loss_weight=(lambda mb, mets: mb["x_sl"].sum()) if ACCUM > 1 else None,
        accum_unroll=ACCUM_UNROLL,
    )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[batches[i % len(batches)] for i in range(n_steps)])

    @jax.jit
    def chain(state, stacked):
        def body(s, b):
            s2, mets = raw_step(s, b, {})
            return s2, mets["loss"]

        return jax.lax.scan(body, state, stacked)

    state, losses = chain(state, stacked)  # compile + warm
    float(jax.device_get(losses[-1]))
    t0 = time.perf_counter()
    state, losses = chain(state, stacked)
    losses = jax.device_get(losses)
    dt = time.perf_counter() - t0
    return state, dt / n_steps, float(losses[0]), float(losses[-1])


def step_flops(loss_fn, state, batch) -> float:
    """Static MXU FLOP count of ONE full train step (fwd + bwd + update),
    counted from the traced jaxpr with scan trip counts multiplied out
    (utils/flops.py — XLA's own cost model counts scan bodies once, useless
    for the recurrent families). Computed on the accum-free monolithic step:
    accumulation splits the same math into microbatches, so the per-step
    total is identical and the count stays comparable across accum settings."""
    from blvm_tpu.parallel import make_train_step
    from blvm_tpu.utils.flops import count_flops

    raw_step = make_train_step(loss_fn, jit=False)
    return count_flops(raw_step, state, batch, {})


def bench_family(name, builder, bf16, steps_a, steps_b, headline):
    from blvm_tpu.parallel import make_train_step
    from blvm_tpu.training import TrainState, get_optimizer

    model, loss_fn, batches, samples_per_step, dtype = builder(bf16)

    first = batches[0]
    # init inside jit: eager op-by-op init would trigger per-op compilation
    init_args = tuple(first[k] for k in ("x", "x_sl", "y", "y_sl") if k in first)
    variables = jax.jit(lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, *init_args))(
        jax.random.PRNGKey(0)
    )
    tx = get_optimizer("Adam", 3e-4)
    state = TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx, rng=jax.random.PRNGKey(2))
    step = make_train_step(
        loss_fn,
        accum=ACCUM,
        # all families' losses are total_nats / total_frames (frames-weighted
        # merge is exact); bench batches are equal-length so uniform would be
        # equivalent, but use the production weighting the drivers use
        loss_weight=(lambda mb, mets: mb["x_sl"].sum()) if ACCUM > 1 else None,
        accum_unroll=ACCUM_UNROLL,
    )

    # warmup / compile — two steps: the first call's output state carries mesh
    # shardings, so the second call compiles the steady-state executable
    for i in range(2):
        state, mets = step(state, batches[i % len(batches)], {})
        float(jax.device_get(mets["loss"]))

    # async timing at two step counts — per-step times must agree (linearity)
    state, dt_a, loss_first, _ = time_steps(step, state, batches, {}, steps_a, sync_every_step=False)
    state, dt_b, _, loss_last = time_steps(step, state, batches, {}, steps_b, sync_every_step=False)
    per_step_a, per_step_b = dt_a / steps_a, dt_b / steps_b
    linear = abs(per_step_a - per_step_b) <= 0.25 * max(per_step_a, per_step_b)

    device = jax.devices()[0]
    kind = getattr(device, "device_kind", "unknown")
    peak = PEAKS_BF16.get(kind, DEFAULT_PEAK)

    # static MXU FLOPs of one full train step from the traced jaxpr — EVERY
    # family carries flops/MFU and a non-vacuous peak-plausibility guard
    # (round-3 verdict #2: only WaveNet had one, so async inflation was
    # unguarded for six of the seven lines)
    try:
        mxu_flops = step_flops(loss_fn, state, batches[0])
    except Exception as e:
        print(f"flop counting failed for {name} ({type(e).__name__}: {e})", file=sys.stderr)
        mxu_flops = None

    fwd_flops = train_flops = None
    if name == "wavenet":
        fwd_flops, train_flops = wavenet_analytic_flops()

    timing_mode = "async_chain"
    per_step = per_step_b

    def impossible(t):
        return mxu_flops is not None and mxu_flops / t > peak

    if linear and not impossible(per_step) and per_step < 0.020:
        # Fast steps can be dispatch-bound even when linear: the relay adds a
        # CONSTANT per-step dispatch latency, which passes the linearity check
        # while hiding the device's true rate (measured: CTC 11.5 ms async vs
        # its sub-7 ms device step). The scan chain (one dispatch for all
        # steps, work forced by device_get of the loss vector) removes the
        # host cost; both modes force the work, so take the faster reading.
        try:
            state, per_step_scan, linear_scan, lf, ll = scan_chain_times(loss_fn, state, batches, steps_a, steps_b)
            if per_step_scan < per_step:
                per_step, loss_first, loss_last = per_step_scan, lf, ll
                timing_mode, linear = "scan_chain", linear_scan
        except Exception as e:
            print(f"scan-chain timing failed for {name} ({type(e).__name__}); keeping async_chain", file=sys.stderr)
    if not linear or impossible(per_step):
        # async dispatch on the relay is not trustworthy for this family
        # (non-linear = per-step dispatch latency dominates, or implausible =
        # async inflation). Re-measure as ONE jitted scan over the steps: a
        # single dispatch containing all the work, closed by device_get of the
        # per-step losses — immune to both failure modes.
        try:
            state, per_step, linear, loss_first, loss_last = scan_chain_times(loss_fn, state, batches, steps_a, steps_b)
            timing_mode = "scan_chain"
        except Exception as e:
            print(f"scan-chain timing failed for {name} ({type(e).__name__}); per-step sync fallback", file=sys.stderr)
            # strict lower bound: every step closed by host sync
            timing_mode = "per_step_sync"
            n_sync = max(10, steps_b // 2)
            state, dt_s, loss_first, loss_last = time_steps(step, state, batches, {}, n_sync, sync_every_step=True)
            per_step = dt_s / n_sync
            linear = True  # per-step sync cannot be async-inflated

    if impossible(per_step):
        print(
            f"IMPLAUSIBLE MEASUREMENT ({name}): MXU FLOP count implies {mxu_flops / per_step:.3e} "
            f"FLOP/s, above {kind} peak {peak:.3e}, even in {timing_mode} mode — refusing to report",
            file=sys.stderr,
        )
        sys.exit(1)

    samples_per_sec = samples_per_step / per_step
    result = {
        "metric": f"{name}_train_throughput_waveform_samples_per_sec"
        if name != "ctc"
        else "ctc_train_throughput_frames_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s" if name != "ctc" else "frames/s",
        "vs_baseline": round(samples_per_sec / BASELINE, 3),
        "ms_per_step": round(per_step * 1e3, 3),
        "device_kind": kind,
        "dtype": dtype,
        "timing_mode": timing_mode,
        "timing_linear": linear,
        "loss_first": round(loss_first, 4),
        "loss_last": round(loss_last, 4),
    }
    if mxu_flops is not None:
        result["flops_per_step"] = round(mxu_flops, 1)
        result["flops_per_sec"] = round(mxu_flops / per_step, 1)
        result["mfu_pct"] = round(100.0 * mxu_flops / per_step / peak, 2)
        result["hw_peak_assumed"] = peak
        result["flops_source"] = "jaxpr_mxu"
    if train_flops is not None:
        # analytic cross-check for the flagship (3x forward heuristic vs the
        # exact traced fwd+bwd count above)
        result["wavenet_train_flops_analytic"] = round(train_flops, 1)
    if headline:
        result["metric"] = "wavenet_train_throughput_waveform_samples_per_sec"
    return result


def bench_family_eval(name, builder, bf16, steps_a, steps_b):
    """Eval-forward throughput: N forward passes embedded in ONE jitted scan.

    Eval steps do not chain through a train state, so async-chain timing has
    nothing forcing earlier steps when the last loss is fetched; the scan
    chain (stacked batches, device_get of the full per-step loss vector)
    forces every pass in a single dispatch — the same discipline that fixed
    the fast-step train timings. Linearity is checked across two chain
    lengths (two compiles; eval forwards compile quickly).
    """
    model, loss_fn, batches, samples_per_step, dtype = builder(bf16)

    first = batches[0]
    init_args = tuple(first[k] for k in ("x", "x_sl", "y", "y_sl") if k in first)
    variables = jax.jit(lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, *init_args))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]

    def timed(n_steps):
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[batches[i % len(batches)] for i in range(n_steps)]
        )

        @jax.jit
        def chain(params, stacked):
            def body(carry, b):
                loss, (mets, _) = loss_fn(params, jax.random.fold_in(jax.random.PRNGKey(0), carry), b, {})
                return carry + 1, loss
            _, losses = jax.lax.scan(body, jnp.int32(0), stacked)
            return losses

        losses = chain(params, stacked)  # compile + warm
        jax.device_get(losses)
        t0 = time.perf_counter()
        losses = jax.device_get(chain(params, stacked))
        dt = time.perf_counter() - t0
        return dt / n_steps, float(losses[0]), float(losses[-1])

    per_step_a, _, _ = timed(steps_a)
    per_step_b, loss_first, loss_last = timed(steps_b)
    linear = abs(per_step_a - per_step_b) <= 0.25 * max(per_step_a, per_step_b)
    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    peak = PEAKS_BF16.get(kind, DEFAULT_PEAK)

    flops_fields = {}
    try:
        from blvm_tpu.utils.flops import count_flops

        fwd = count_flops(lambda p, b: loss_fn(p, jax.random.PRNGKey(0), b, {})[0], params, batches[0])
        if fwd / per_step_b > peak:
            print(
                f"IMPLAUSIBLE EVAL MEASUREMENT ({name}): {fwd / per_step_b:.3e} FLOP/s above "
                f"{kind} peak {peak:.3e} — refusing to report",
                file=sys.stderr,
            )
            sys.exit(1)
        flops_fields = {
            "flops_per_step": round(fwd, 1),
            "flops_per_sec": round(fwd / per_step_b, 1),
            "mfu_pct": round(100.0 * fwd / per_step_b / peak, 2),
            "hw_peak_assumed": peak,
            "flops_source": "jaxpr_mxu",
        }
    except Exception as e:
        print(f"flop counting failed for {name} eval ({type(e).__name__}: {e})", file=sys.stderr)

    samples_per_sec = samples_per_step / per_step_b
    return {
        **flops_fields,
        "metric": f"{name}_eval_throughput_waveform_samples_per_sec"
        if name != "ctc"
        else "ctc_eval_throughput_frames_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s" if name != "ctc" else "frames/s",
        "vs_baseline": round(samples_per_sec / BASELINE, 3),
        "ms_per_step": round(per_step_b * 1e3, 3),
        "device_kind": kind,
        "dtype": dtype,
        "timing_mode": "scan_chain",
        "timing_linear": linear,
        "loss_first": round(loss_first, 4),
        "loss_last": round(loss_last, 4),
    }


def bench_generation(bf16, fast, n_frames):
    """WaveNet ancestral sampling throughput (flagship config, B=2 sequences).

    ``fast`` times the Fast-WaveNet circular-buffer scan (the default
    generation path); ``fast=False`` times the windowed-rescan oracle. Timing
    is closed by device_get of the last emitted frame (the scan chain forces
    every step); two lengths are timed and the per-frame times of the longer
    run are reported with a linearity flag against the shorter.
    """
    from blvm_tpu.models import WaveNet

    model = WaveNet(
        n_layers=WN_LAYERS, n_stacks=WN_STACKS, res_channels=WN_RES, num_mix=WN_MIX, num_bins=WN_BINS, bf16=bf16
    )
    x0 = jnp.zeros((1, model.receptive_field + 8), jnp.float32)
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x0, jnp.full((1,), x0.shape[1], jnp.int32))
    )(jax.random.PRNGKey(0))

    def timed(n, key):
        gen = jax.jit(
            lambda params, k: model.apply(
                {"params": params}, n_samples=2, n_frames=n, fast=fast, rngs={"sample": k},
                method=type(model).generate,
            )
        )
        float(jax.device_get(gen(variables["params"], jax.random.PRNGKey(0))[0, -1]))  # compile+warm
        t0 = time.perf_counter()
        float(jax.device_get(gen(variables["params"], key)[0, -1]))
        return (time.perf_counter() - t0) / n

    per_frame_a = timed(max(200, n_frames // 8), jax.random.PRNGKey(1))
    per_frame_b = timed(n_frames, jax.random.PRNGKey(2))
    linear = abs(per_frame_a - per_frame_b) <= 0.25 * max(per_frame_a, per_frame_b)
    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    return {
        "metric": "wavenet_generation_frames_per_sec",
        "value": round(1.0 / per_frame_b, 1),
        "unit": "frames/s",
        "vs_baseline": round((1.0 / per_frame_b) / 452.0, 3),  # round-2 windowed-scan figure
        "n_frames": n_frames,
        "path": "fast" if fast else "windowed",
        "device_kind": kind,
        "dtype": "bf16" if bf16 else "f32",
        "timing_linear": linear,
    }


def bench_multiseed(num_seeds, steps, bf16, family="vrnn"):
    """Multi-seed sweep throughput on one chip (``--multiseed K``).

    The reference sweeps seeds as INDEPENDENT serial processes per GPU
    (``schedule_experiments.py``); ``parallel/multiseed.py`` vmaps K replicas
    into one program (seed axis sharded over the mesh — on one chip, vmap
    batches the K small recurrent matmuls onto the idle MXU). This measures
    that claim falsifiably: per-step time of the K-seed step vs the
    single-seed step, same family shape, same timing discipline
    (device_get-closed, varying batches, two-length linearity check).
    ``sweep_speedup_vs_serial`` = K * t_single / t_multiseed — the wall-clock
    factor vs running the K-run sweep back-to-back on this chip.
    """
    from blvm_tpu.parallel import (
        make_mesh,
        make_multiseed_train_step,
        make_train_step,
        multiseed_train_state,
    )
    from blvm_tpu.training import TrainState, get_optimizer

    mesh = make_mesh(1)
    builder = FAMILIES[family]
    model, loss_fn, batches, samples_per_step, dtype = builder(bf16)
    first = batches[0]
    tx = get_optimizer("Adam", 3e-4)

    def make_state(k):
        kp, kr = jax.random.split(k)
        v = model.init({"params": kp, "sample": jax.random.PRNGKey(1)}, first["x"], first["x_sl"])
        return TrainState.create(apply_fn=model.apply, params=v["params"], tx=tx, rng=kr)

    def timed(step, state, n_steps, loss_to_float):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, mets = step(state, batches[i % len(batches)], {})
        last = loss_to_float(jax.device_get(mets["loss"]))  # forces the chain
        return state, (time.perf_counter() - t0) / n_steps, last

    def measure(step, state, loss_to_float):
        for i in range(2):  # two-step warmup (steady-state executable)
            state, mets = step(state, batches[i % len(batches)], {})
            loss_to_float(jax.device_get(mets["loss"]))
        state, per_a, _ = timed(step, state, max(5, steps // 5), loss_to_float)
        state, per_b, loss_last = timed(step, state, steps, loss_to_float)
        linear = abs(per_a - per_b) <= 0.25 * max(per_a, per_b)
        return per_b, linear, loss_last

    # single seed (the serial-sweep unit)
    state1 = jax.jit(make_state)(jax.random.PRNGKey(0))
    step1 = make_train_step(loss_fn, mesh=mesh)
    t1, linear1, _ = measure(step1, state1, float)

    # K seeds in one program
    keys = jax.random.split(jax.random.PRNGKey(0), num_seeds)
    state_k = multiseed_train_state(make_state, keys, mesh)
    step_k = make_multiseed_train_step(loss_fn, num_seeds, mesh=mesh)
    t_k, linear_k, loss_last = measure(step_k, state_k, lambda l: float(np.asarray(l).sum()))

    aggregate = num_seeds * samples_per_step / t_k
    return {
        "metric": f"{family}_multiseed{num_seeds}_aggregate_samples_per_sec",
        "value": round(aggregate, 1),
        "unit": "samples/s",
        "vs_baseline": round(aggregate / BASELINE, 3),
        "ms_per_step": round(t_k * 1e3, 3),
        "single_seed_ms_per_step": round(t1 * 1e3, 3),
        "sweep_speedup_vs_serial": round(num_seeds * t1 / t_k, 2),
        "num_seeds": num_seeds,
        "dtype": dtype,
        "timing_linear": bool(linear1 and linear_k),
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
    }


def bench_stcn_generation(bf16, n_frames, fast=True):
    """STCN ancestral sampling throughput (flagship config, B=2 sequences) —
    capability ADDED over the reference (its ``STCN.generate`` raises
    ``NotImplementedError``, ``stcn.py:435-442``), so there is no reference
    figure to normalize against; ``vs_baseline`` is vs the frame rate of the
    16 kHz waveform (1.0 = real time). ``fast`` times the circular-buffer
    scan (the default generation path, round-4; equality-tested vs the
    windowed oracle); ``fast=False`` times the windowed rescan. Same timing
    discipline as the WaveNet generation bench (device_get-closed,
    two-length linearity check)."""
    from blvm_tpu.models import STCN

    model = STCN(n_layers=5, latent_size=(256, 128, 64, 32, 16), res_channels=256, bf16=bf16)
    x0 = jnp.zeros((1, model.receptive_field + 8), jnp.float32)
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x0, jnp.full((1,), x0.shape[1], jnp.int32))
    )(jax.random.PRNGKey(0))

    def timed(n, key):
        gen = jax.jit(
            lambda params, k: model.apply(
                {"params": params}, n_samples=2, max_timesteps=n, fast=fast, rngs={"sample": k},
                method=type(model).generate,
            )[0][0]
        )
        float(jax.device_get(gen(variables["params"], jax.random.PRNGKey(0))[0, -1]))  # compile+warm
        t0 = time.perf_counter()
        float(jax.device_get(gen(variables["params"], key)[0, -1]))
        return (time.perf_counter() - t0) / n

    per_frame_a = timed(max(200, n_frames // 8), jax.random.PRNGKey(1))
    per_frame_b = timed(n_frames, jax.random.PRNGKey(2))
    linear = abs(per_frame_a - per_frame_b) <= 0.25 * max(per_frame_a, per_frame_b)
    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    return {
        "metric": "stcn_generation_frames_per_sec",
        "value": round(1.0 / per_frame_b, 1),
        "unit": "frames/s",
        "vs_baseline": round((1.0 / per_frame_b) / 16000.0, 4),  # 1.0 = 16 kHz real time
        "n_frames": n_frames,
        "path": "fast" if fast else "windowed",
        "device_kind": kind,
        "dtype": "bf16" if bf16 else "f32",
        "timing_linear": linear,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--all", action="store_true", help="benchmark every family (one JSON line each)")
    parser.add_argument("--families", type=str, default=None, help="comma-separated subset of " + ",".join(FAMILIES))
    parser.add_argument("--f32", action="store_true", help="force float32 (default: production bf16/f32 mix)")
    parser.add_argument("--steps", type=int, default=None, help="override the longer timing step count")
    parser.add_argument("--remat", action="store_true", help="rematerialize WaveNet/STCN residual blocks in backward")
    parser.add_argument("--accum_unroll", action=argparse.BooleanOptionalAction, default=None, help="unroll the accumulation microbatches into one XLA graph (no scan barrier; lets the scheduler interleave the independent chains); unset uses per-family production defaults")
    parser.add_argument("--accum", type=int, default=None, help="gradient-accumulation microbatches (exact weighted update); 1 forces monolithic, unset uses per-family production defaults")
    parser.add_argument("--wn_batch", type=int, default=None, help="override the flagship WaveNet batch size (default 8; the reference driver's default batch budget is 16 s = B=16 at T=16000)")
    parser.add_argument("--wn_stack_frames", type=int, default=None, help="frame-stacked WaveNet grid point (benchmarks.txt s in {64, 256}); s>1 switches to T=65536 segments (the round-2 measurement shape) and accum defaults to 1 (no capacity pressure at T/s conv frames)")
    parser.add_argument("--eval", action="store_true", help="benchmark eval-forward throughput instead of train steps")
    parser.add_argument("--generation", action="store_true", help="benchmark WaveNet ancestral sampling instead")
    parser.add_argument("--gen_naive", action="store_true", help="with --generation: time the windowed-rescan oracle")
    parser.add_argument("--gen_frames", type=int, default=16000, help="with --generation: frames per sequence")
    parser.add_argument("--stcn_generation", action="store_true",
                        help="benchmark STCN ancestral sampling (capability added over the reference)")
    parser.add_argument("--multiseed", type=int, default=None,
                        help="benchmark a K-seed sweep in one program (parallel/multiseed.py) vs K serial "
                        "single-seed runs; family from --families (default vrnn)")
    args = parser.parse_args()

    global REMAT, ACCUM, ACCUM_UNROLL, WN_B, WN_T, WN_S
    REMAT = args.remat
    if args.wn_batch:
        WN_B = args.wn_batch
    if args.wn_stack_frames and args.wn_stack_frames > 1:
        WN_S, WN_T = args.wn_stack_frames, 65536

    from blvm_tpu.utils.device import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from blvm_tpu.parallel import make_mesh

    make_mesh(1)
    bf16 = not args.f32

    if args.generation:
        print(json.dumps(bench_generation(bf16, fast=not args.gen_naive, n_frames=args.gen_frames)))
        return

    if args.stcn_generation:
        print(json.dumps(bench_stcn_generation(bf16, n_frames=args.gen_frames, fast=not args.gen_naive)))
        return

    if args.multiseed:
        fam = (args.families.split(",")[0] if args.families else "vrnn").strip()
        if fam not in FAMILIES:
            parser.error(f"unknown family: {fam}")
        print(json.dumps(bench_multiseed(args.multiseed, args.steps or 30, bf16, fam)))
        return

    if args.families:
        names = [n.strip() for n in args.families.split(",") if n.strip()]
    elif args.all:
        names = list(FAMILIES)
    else:
        names = ["wavenet"]
    unknown = [n for n in names if n not in FAMILIES]
    if unknown:
        parser.error(f"unknown families: {unknown}")

    headline_only = names == ["wavenet"]
    for name in names:
        ACCUM = args.accum if args.accum is not None else FAMILY_ACCUM_DEFAULTS.get(name, 1)
        if name == "wavenet" and WN_S > 1 and args.accum is None:
            ACCUM = 1  # s>1 runs at T/s conv frames: no capacity pressure to relieve
        ACCUM_UNROLL = args.accum_unroll if args.accum_unroll is not None else FAMILY_UNROLL_DEFAULTS.get(name, False)
        steps_b = args.steps or (100 if name == "wavenet" else 50)
        steps_a = max(5, steps_b // 5)
        try:
            if args.eval:
                result = bench_family_eval(name, FAMILIES[name], bf16, steps_a, steps_b)
            else:
                result = bench_family(name, FAMILIES[name], bf16, steps_a, steps_b, headline=headline_only)
        except Exception as e:
            if len(names) == 1:
                raise  # single-family (incl. the driver's headline run): fail loudly
            # multi-family sweep: report the failure as data and keep going so
            # one family's OOM/compile failure can't hide the others' numbers
            result = {"metric": f"{name}_benchmark_error", "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(result))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
