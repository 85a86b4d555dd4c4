"""Long-horizon convergence parity: torch reference driver vs blvm_tpu driver.

Runs both legs (fresh subprocesses: ``torch_leg.py``, ``jax_leg.py``) for each
family, verifies batch-plan identity, compares the per-epoch train / eval
bits-per-frame trajectories at matched epochs, and writes:

  * ``CONVERGENCE_r04.json``           — the committed artifact (repo root)
  * ``tests/parity/goldens/convergence_<family>.json``  — frozen torch
    trajectory + batch signatures (replayed torch-free by
    ``tests/parity/test_convergence.py``)
  * ``tests/parity/goldens/convergence_<family>_init.msgpack`` — transplanted
    initial parameters.

Usage: python scripts/parity/run_convergence.py [lstm vrnn ...]
"""

import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import convergence_common as cc  # noqa: E402

GOLDEN_DIR = os.path.join(cc.REPO, "tests", "parity", "goldens")
OUT_ROOT = "/tmp/convergence_out"


def run_leg(script, args, extra_env=None):
    env = dict(os.environ)
    env.update(
        PYTHONPATH=cc.REPO,
        JAX_PLATFORMS="cpu",
        PYTORCH_JIT="0",  # runtime rsample patches must reach the VRNN cell
    )
    env.update(extra_env or {})
    cmd = [sys.executable, os.path.join(HERE, script), *args]
    print("::", " ".join(cmd))
    subprocess.run(cmd, check=True, env=env, cwd=cc.REPO)


def torch_step_signatures(trace):
    return [s["x_sl"] for s in trace["steps"]]


def compare_family(family, torch_trace, jax_trace, prefix=False):
    """Batch-plan identity + trajectory deltas. Returns the comparison dict.

    ``prefix=True`` (the torch-free regression test's mode) compares only the
    jax run's length against the golden's prefix."""
    cfg = cc.family_config(family)
    # our first recorded batch is the driver's warmup fetch (the torch leg
    # records forwards, and the reference's summary fetch runs no forward);
    # some reference drivers smoke-forward the warmup batch before the loop
    # (no update) — those leading torch records are skipped symmetrically
    pre = cfg.get("torch_preloop_forwards", 0)
    torch_trace = dict(torch_trace, steps=torch_trace["steps"][pre:])
    jax_sigs = [[v for v in b if v > 0] for b in jax_trace["batches"][1:]]
    torch_sigs = torch_step_signatures(torch_trace)
    if prefix:
        assert len(jax_sigs) <= len(torch_sigs), f"{family}: replay longer than golden"
        torch_sigs = torch_sigs[: len(jax_sigs)]
        torch_trace = dict(torch_trace, steps=torch_trace["steps"][: len(jax_sigs)])
    else:
        assert len(jax_sigs) == len(torch_sigs), (
            f"{family}: batch count mismatch — torch {len(torch_sigs)} forwards, jax {len(jax_sigs)} batches"
        )
    n_mismatch = sum(1 for a, b in zip(jax_sigs, torch_sigs) if a != b)
    assert n_mismatch == 0, f"{family}: {n_mismatch}/{len(jax_sigs)} batch signatures differ"

    # per-step loss comparison (1:1 in consumption order); early steps are
    # near-identical params so any semantic drift shows immediately, late
    # steps accumulate f32 update noise
    t_losses = [s["loss"] for s in torch_trace["steps"]]
    j_losses = jax_trace.get("step_losses", [])
    step_rel = [abs(a - b) / max(abs(a), 1e-12) for a, b in zip(t_losses, j_losses)]
    step_stats = {
        "n": len(step_rel),
        "max_rel_first50": max(step_rel[:50]) if step_rel else None,
        "max_rel_first100": max(step_rel[:100]) if step_rel else None,
        "max_rel": max(step_rel) if step_rel else None,
    }

    # per-epoch metric comparison at matched epochs; the torch tracker logs a
    # nested {source: {metric: value}} dict per epoch, ours metrics.jsonl rows
    deltas = {}
    rows = []
    for epoch_idx, (tlog, jlog) in enumerate(zip(torch_trace["logs"], jax_trace["epochs"]), start=1):
        row = {"epoch": epoch_idx}
        # top-level lr trajectories — the exact schedule-drift detector (an
        # off-by-one milestone or wrong gamma shows as a step function here).
        # The reference drivers log it as "learning_rate" (lstm) or "lr"
        # (the get_learning_rates_dict drivers — utils/optimization.py:17)
        t_lr = tlog.get("learning_rate", tlog.get("lr"))
        # the reference STCN driver logs the lr AFTER lr_scheduler.step()
        # (experiment_stcn_audio.py:298-301) — i.e. the NEXT epoch's lr —
        # so its series compares against our next row
        j_lr_log = jax_trace["epochs"][epoch_idx] if cfg.get("lr_log_offset") and epoch_idx < len(jax_trace["epochs"]) else jlog
        if t_lr is not None and "learning_rate" in j_lr_log:
            tv, jv = float(t_lr), float(j_lr_log["learning_rate"])
            rel = abs(jv - tv) / max(abs(tv), 1e-12)
            row["learning_rate"] = {"torch": tv, "jax": jv, "rel": rel}
            deltas.setdefault("learning_rate", []).append(rel)
        for t_source, t_metrics in tlog.items():
            if not isinstance(t_metrics, dict):
                continue
            # torch source names are the synthetic CSV paths on both sides
            j_metrics = jlog.get(t_source)
            if not isinstance(j_metrics, dict):
                continue
            tag = "train" if "train" in os.path.basename(t_source) else os.path.basename(t_source).split(".")[0]
            for key in cfg["metric_keys"]:
                if key in t_metrics and key in j_metrics:
                    tv, jv = float(t_metrics[key]), float(j_metrics[key])
                    rel = abs(jv - tv) / max(abs(tv), 1e-12)
                    row[f"{tag}/{key}"] = {"torch": tv, "jax": jv, "rel": rel}
                    deltas.setdefault(f"{tag}/{key}", []).append(rel)
        rows.append(row)

    summary = {k: {"max_rel": max(v), "last_rel": v[-1], "n": len(v)} for k, v in sorted(deltas.items())}
    n_train_steps = sum(1 for s in torch_trace["steps"] if s["training"])
    return {
        "family": family,
        "train_steps": n_train_steps,
        "epochs": len(rows),
        "batch_plan_identical": True,
        "batches_compared": len(jax_sigs),
        "step_losses": step_stats,
        "summary": summary,
        "per_epoch": rows,
    }


def main(families):
    results = {}
    for family in families:
        out = os.path.join(OUT_ROOT, family)
        shutil.rmtree(out, ignore_errors=True)
        run_leg("torch_leg.py", [family, out])
        run_leg("jax_leg.py", [family, out, out])

        torch_trace = json.load(open(os.path.join(out, "torch_trace.json")))
        jax_trace = json.load(open(os.path.join(out, "jax_trace.json")))
        results[family] = compare_family(family, torch_trace, jax_trace)

        # freeze the torch trajectory + init params as torch-free goldens
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        shutil.copy(os.path.join(out, "torch_trace.json"), os.path.join(GOLDEN_DIR, f"convergence_{family}.json"))
        shutil.copy(
            os.path.join(out, "model_params.msgpack"),
            os.path.join(GOLDEN_DIR, f"convergence_{family}_init.msgpack"),
        )

        s = results[family]["summary"]
        print(f"[{family}] {results[family]['train_steps']} train steps; max rel deltas:")
        for k, v in s.items():
            print(f"    {k:>24}: max {v['max_rel']:.2e}  last {v['last_rel']:.2e}")

    # merge into an existing artifact so families can be (re)generated alone
    # (round 5 carries the r04 results forward for the untouched families)
    art_path = os.path.join(cc.REPO, "CONVERGENCE_r05.json")
    merged = {}
    for prior in (os.path.join(cc.REPO, "CONVERGENCE_r04.json"), art_path):
        if os.path.exists(prior):
            merged.update(json.load(open(prior)).get("results", {}))
    merged.update({f: {k: v for k, v in r.items() if k != "per_epoch"} for f, r in results.items()})
    artifact = {"round": 5, "tolerance_note": "see tests/parity/test_convergence.py", "results": merged}
    cc.write_json(art_path, artifact)
    with open(os.path.join(OUT_ROOT, "full_comparison.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote CONVERGENCE_r05.json + goldens for {list(results)}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["lstm", "vrnn", "srnn", "stcn", "wavenet", "cwvae", "asr"])
