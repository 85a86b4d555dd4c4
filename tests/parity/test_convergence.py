"""Long-horizon convergence parity vs the torch reference DRIVER (torch-free).

The frozen goldens (``goldens/convergence_<family>.json`` + ``_init.msgpack``)
were produced by ``scripts/parity/run_convergence.py``: the ACTUAL reference
driver script (``/root/reference/experiments/experiment_<family>_audio.py``)
run for ~340 optimizer steps on a synthetic dataset with the length-bucketed
sampler, epoch-stepped MultiStepLR (milestone at epoch 12), and — for VRNN —
live beta/free-nats cosine annealers, recording every forward's batch plan and
loss plus every epoch's aggregated tracker metrics.

This test replays OUR driver (as a subprocess, the real CLI) from the
transplanted initial weights over the first 14 epochs (~190 steps — past the
lr milestone, past the VRNN annealer sweeps, through three eval rounds) and
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

Full-horizon artifact: ``CONVERGENCE_r04.json`` (repo root). Regenerate the
goldens (needs /root/reference + torch) with
``python scripts/parity/run_convergence.py``.
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

FAMILIES = [f for f in ("lstm", "vrnn") if (GOLDEN_DIR / f"convergence_{f}.json").exists()]

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
        timeout=1500,
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
    t_losses = [s["loss"] for s in golden["steps"][:100]]
    j_losses = jax_trace["step_losses"][:100]
    worst = max(abs(a - b) / abs(a) for a, b in zip(t_losses, j_losses))
    step_tol = {"lstm": 1e-5, "vrnn": 1e-3}[family]  # see module docstring
    assert worst <= step_tol, f"{family}: per-step loss drift {worst:.2e} in the first 100 steps"

    # per-epoch aggregate trajectories within the 0.5% north-star tolerance;
    # annealer scalars (beta/free_nats) must match essentially exactly
    for key, stats in result["summary"].items():
        if key.endswith("/kl"):
            continue  # near-zero KL makes relative error meaningless (see module docstring)
        tol = 1e-6 if key.endswith(("/beta", "/free_nats")) else 5e-3
        assert stats["max_rel"] <= tol, f"{family}: {key} max rel {stats['max_rel']:.2e} over {stats['n']} epochs"
