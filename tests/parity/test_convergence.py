"""Long-horizon convergence parity vs the torch reference DRIVER (torch-free).

The frozen goldens (``goldens/convergence_<family>.json`` + ``_init.msgpack``)
were produced by ``scripts/parity/run_convergence.py``: the ACTUAL reference
driver script (``/root/reference/experiments/experiment_<family>_audio.py``)
run for ~340 optimizer steps on a synthetic dataset with the length-bucketed
sampler, epoch-stepped MultiStepLR (milestone at epoch 12), and — for VRNN —
live beta/free-nats cosine annealers, recording every forward's batch plan and
loss plus every epoch's aggregated tracker metrics.

Round-4 coverage: ALL SIX families — LSTM, WaveNet, VRNN, SRNN (tight binding
clips: max_grad_norm 3.0 / max_grad_value 1.0, the reference SRNN driver
defaults), STCN (conv hierarchy; live RandomSegment on both sides; the
reference driver's raw-samples --batch_len quirk and its pre-loop smoke
forward both mirrored), and CWVAE (multi-level strided coders + RSSM scans,
cosine beta/free-nats annealers; exact-T batches via --bucket_multiple 1 —
its channel-wise GroupNorm normalizes over the padded time axis, so
bucket-padded batches shift the loss ~8e-5; step-0 loss then agrees to
7.9e-8). Full-horizon measurements (CONVERGENCE_r04.json): first-50-step
losses agree to 4.9e-7 / 8.4e-5 / 9.5e-7 / 1.7e-6 / 1.1e-4 (cwvae), per-epoch
aggregates within 0.27% / 0.013% / 0.018% / 0.03% / 0.15% (cwvae).

Round-4 also adds the ASR/CTC PROBE driver (the seventh trajectory): waveform
input (StackTensor frames), phoneme CTC targets on synthetic TIMIT-format
.PHN transcripts, biLSTM×2 through the fused-directions scan, the reference's
hardcoded extra male/female eval splits mirrored via --extra_test_sources,
dropout off (torch/jax PRNGs cannot match), fixed-count epochs disabled on
both sides (the reference's num_batches buffer handling clobbers its own
result — see scripts/parity/torch_leg.py). Measured over the FULL horizon
(337 steps, 24 epochs): per-step losses ≤ 2.3e-5, WER and CER EXACTLY equal
on every eval source at every epoch (the greedy decode is bit-stable), the
only nonzero error-rate delta a single train-CER edit flip (1.5e-3) in one
epoch. The torch leg installs a real Levenshtein in the editdistance stub —
the package is absent in this image and the stub returns 0.

This test replays OUR driver (as a subprocess, the real CLI) from the
transplanted initial weights over the first 14 epochs (~190 steps — past the
lr milestone, past the annealer sweeps, through three eval rounds) and
asserts against the golden:

  * batch-PLAN identity — every step's x_sl signature equals the reference's
    (``--sampler_shared_rng`` reproduces its global-random sampler stream);
  * per-step losses over the first 100 steps (both sides run f32 from
    identical weights on identical batches — any schedule/semantic drift shows
    here as a step-function): ≤ 1e-5 (lstm; full-run artifact measured
    ≤ 4.9e-7 over the first 50) / ≤ 1e-3 (vrnn; measured ≤ 3.7e-4 — spiky
    cancellation noise: the ELBO is a large-magnitude rec − β·kl difference,
    and occasional batches amplify f32 rounding; steps 1-10 agree to 2e-7,
    ruling out systematic drift);
  * VRNN annealer trajectories (beta, free_nats per epoch): ≤ 1e-6 relative —
    the exact off-by-one detector (both are host-side floats of the same
    cosine schedule stepped once per training step);
  * per-epoch train/eval aggregates (loss, bpd, elbo, rec): ≤ 0.5% relative —
    the BASELINE.json bits/frame north-star tolerance. The residual is f32
    update-accumulation noise amplified by the recurrent training dynamics:
    the full 24-epoch runs measured ≤ 0.27% (lstm) / 0.013% (vrnn), with the
    divergence growing smoothly from ~1e-7 (no step-function — see
    CONVERGENCE_r04.json). KL is excluded from the relative gate (near-zero
    values early in training make relative error meaningless); it is covered
    through elbo = rec − β·kl.

Round-5 closed the one loose trajectory, WaveNet (r04: train/bpd max_rel
1.46e-2 mid-horizon, hypothesized as f32/DMoL noise). The real cause was an
ASYMMETRIC schedule in the harness config: the reference WaveNet driver
parses the shared ``--lr_scheduler`` flag but never builds a scheduler
(``experiment_wavenet_audio.py:187`` — fixed Adam lr), while our driver
honors it, so our leg halved the lr at the epoch-12 milestone and torch did
not. With the flags dropped (torch trajectory verified bit-identical —
the flag really was dead) the full-horizon deltas collapse to per-step
≤ 7.5e-6 / per-epoch ≤ 2.8e-6 (CONVERGENCE_r05.json), and the torch leg now
records an lr series from OPTIMIZER STATE (``torch_leg.recording_log``), so
WaveNet's lr gate is exact like every other family's. A double-precision
torch control (TORCH_LEG_F64=1, identical init via TORCH_LEG_INIT) bounds
torch's own f32-vs-f64 sensitivity on this config — the update-noise
yardstick for the residual.

Full-horizon artifact: ``CONVERGENCE_r05.json`` (repo root; r04 results
carried forward for unchanged families). Regenerate the goldens (needs
/root/reference + torch) with ``python scripts/parity/run_convergence.py``.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).with_name("goldens")
SCRIPTS = Path(__file__).resolve().parents[2] / "scripts" / "parity"
REPLAY_EPOCHS = 14

FAMILIES = [
    f
    for f in ("lstm", "vrnn", "srnn", "stcn", "wavenet", "cwvae", "asr")
    if (GOLDEN_DIR / f"convergence_{f}.json").exists()
]

pytestmark = pytest.mark.skipif(not FAMILIES, reason="no convergence goldens generated")


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_convergence_vs_reference_driver(family, tmp_path):
    golden = json.loads((GOLDEN_DIR / f"convergence_{family}.json").read_text())
    init = GOLDEN_DIR / f"convergence_{family}_init.msgpack"

    env = dict(os.environ, PYTHONPATH=str(SCRIPTS.parents[1]), JAX_PLATFORMS="cpu")
    out = tmp_path / family
    subprocess.run(
        [sys.executable, str(SCRIPTS / "jax_leg.py"), family, str(init), str(out), str(REPLAY_EPOCHS)],
        check=True,
        env=env,
        cwd=str(SCRIPTS.parents[1]),
        # cwvae replays with --bucket_multiple 1 (exact-T batches — see module
        # docstring), so every distinct batch shape compiles: ~17 min alone on
        # the 1-CPU host, longer under full-suite load
        timeout=2700 if family == "cwvae" else 1500,
    )
    jax_trace = json.loads((out / "jax_trace.json").read_text())

    sys.path.insert(0, str(SCRIPTS))
    try:
        from run_convergence import compare_family
    finally:
        sys.path.pop(0)

    result = compare_family(family, golden, jax_trace, prefix=True)  # asserts batch-plan identity

    # per-step loss parity over the first 100 steps (semantic-drift detector)
    steps = result["step_losses"]
    assert steps["n"] >= 150, f"replay too short: {steps['n']} steps"
    worst = steps["max_rel_first100"]  # aligned by compare_family (pre-loop forwards skipped)
    # see module docstring; cwvae measured 2.1e-4 over the first 100 (step 0
    # at 7.9e-8 — exact-T batches; smooth f32 Adam/GroupNorm accumulation);
    # asr measured 1.9e-5 over the first 100 / 2.3e-5 over the full horizon
    # wavenet measured 6.4e-7 over the first 100 once the round-4 schedule
    # asymmetry was removed (module docstring; CONVERGENCE_r05.json)
    step_tol = {
        "lstm": 1e-5, "vrnn": 1e-3, "srnn": 1e-3, "stcn": 1e-3, "wavenet": 1e-5, "cwvae": 1e-3, "asr": 1e-4,
    }[family]
    assert worst <= step_tol, f"{family}: per-step loss drift {worst:.2e} in the first 100 steps"

    # lr trajectories must match exactly. For the families whose reference
    # driver logs no lr (wavenet), the golden's series comes from the torch
    # leg's optimizer-state probe (torch_leg.recording_log) — the reference
    # WaveNet driver builds no scheduler at all, so the series is the constant
    # Adam lr and the gate catches any scheduler our driver would wrongly run.
    lr_stats = result["summary"].get("learning_rate")
    assert lr_stats is not None and lr_stats["max_rel"] <= 1e-6, f"{family}: lr trajectory {lr_stats}"

    # per-epoch aggregate trajectories within the 0.5% north-star tolerance;
    # annealer scalars (beta/free_nats) must match essentially exactly.
    # (WaveNet's round-4 3e-2 post-milestone exemption is GONE: the excursion
    # was the harness's asymmetric lr schedule, not model noise — with the
    # dead reference flag mirrored, wavenet measures ≤ 2.8e-6 per epoch over
    # the full horizon, the tightest of all seven trajectories.)
    for row in result["per_epoch"]:
        for key, cell in row.items():
            if key == "epoch" or not isinstance(cell, dict):
                continue
            if "/kl" in key or key == "learning_rate":
                continue  # near-zero KL (incl. cwvae "kl (bpt)"): relative error meaningless; lr gated above
            tol = 1e-6 if key.endswith(("/beta", "/free_nats")) else 5e-3
            assert cell["rel"] <= tol, f"{family}: epoch {row['epoch']} {key} rel {cell['rel']:.2e}"
