"""A/B/A: the CWVAE train step under the two depthwise lowerings, one session.

Round-4 verdict item 2: between the r03 and r04 bench artifacts the CWVAE
flagship step silently moved 16.1 -> 30.2 ms. Git places commit 437c3ee (which
made the depthwise lowering unconditionally "fma" — the SPMD-safe shift-FMA
form needed on multi-axis meshes) between the two runs; the mesh-aware "auto"
switch (grouped "conv" on single-axis meshes) landed afterwards. This script
settles the attribution with committed evidence: it benches the SAME CWVAE
flagship config (bench.py:build_cwvae) with impl forced to "conv", then "fma",
then "conv" again — all in ONE process minutes apart, so environment drift
between the arms is visible as A-vs-A disagreement.

Interpretation:
  * conv fast / fma slow  -> the r04 regression was 437c3ee's forced lowering;
    the current "auto" default (which resolves to "conv" on the single-chip
    bench mesh) already restores the fast path.
  * both slow             -> the shift was environmental after all.

Writes CWVAE_DEPTHWISE_AB_r05.json at the repo root and prints each bench line.

Run on the TPU (serialize with everything else — NOTES.md relay hazards):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/ab_cwvae_depthwise.py
"""

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

import bench  # noqa: E402  (repo-root bench.py: the standing measurement discipline)
from blvm_tpu.modules.convolutions import set_depthwise_impl  # noqa: E402
from blvm_tpu.parallel import make_mesh  # noqa: E402
from blvm_tpu.utils.device import enable_persistent_compile_cache  # noqa: E402


def run_arm(tag, impl):
    # set BEFORE building: the lowering is chosen at trace time, and each
    # bench_family call builds a fresh model + step (fresh trace)
    set_depthwise_impl(impl)
    result = bench.bench_family("cwvae", bench.build_cwvae, bf16=True, steps_a=10, steps_b=50, headline=False)
    result["depthwise_impl"] = impl
    result["arm"] = tag
    print(json.dumps(result), flush=True)
    return result


def main():
    enable_persistent_compile_cache()
    make_mesh(1)  # the single-chip bench mesh (what "auto" would see)
    arms = [run_arm("A1", "conv"), run_arm("B", "fma"), run_arm("A2", "conv")]
    a1, b, a2 = (r["ms_per_step"] for r in arms)
    out = {
        "metric": "cwvae_depthwise_lowering_ab",
        "config": "bench.py flagship (B=8, T=16384, strides 64*16*16, bf16 coders)",
        "device_kind": arms[0]["device_kind"],
        "conv_ms_per_step": [a1, a2],
        "fma_ms_per_step": b,
        "fma_over_conv": round(b / ((a1 + a2) / 2), 3),
        "same_session_drift_pct": round(abs(a1 - a2) / max(a1, a2) * 100, 2),
        "arms": arms,
        "conclusion": (
            "code-caused: the forced fma lowering reproduces the slow step while conv restores the fast one"
            if b > 1.3 * max(a1, a2) and abs(a1 - a2) <= 0.15 * max(a1, a2)
            else "inconclusive or environmental - inspect arms"
        ),
    }
    with open(os.path.join(REPO_ROOT, "CWVAE_DEPTHWISE_AB_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}))


if __name__ == "__main__":
    main()
