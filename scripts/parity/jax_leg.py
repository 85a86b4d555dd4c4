"""JAX leg of the convergence parity harness: run THIS repo's driver CLI on
the same synthetic dataset, from the transplanted initial weights
(``--init_checkpoint``), with ``--sampler_shared_rng`` reproducing the
reference's batch plans. Records every loader batch's ``x_sl`` (the batch-plan
signature) and collects the per-epoch metrics from the run's metrics.jsonl.

Usage: python jax_leg.py <family> <init_checkpoint> <out_dir> [epochs_override]

``epochs_override`` replays only the first K epochs (the torch-free regression
test uses a prefix long enough to cover every live schedule: lr milestone,
annealer sweeps, eval cadence).
"""

import json
import os
import runpy
import sys

# the axon sitecustomize pins jax to the TPU relay regardless of JAX_PLATFORMS;
# override the live config like tests/conftest.py does — the replay must be
# relay-independent (CPU) so the regression test is deterministic anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import convergence_common as cc  # noqa: E402

sys.path.insert(0, cc.REPO)
sys.path.insert(0, os.path.join(cc.REPO, "experiments"))  # drivers do `from common import ...`


def main(family: str, init_dir: str, out_dir: str, epochs_override=None):
    cfg = cc.family_config(family)
    paths = cc.make_dataset()
    os.makedirs(out_dir, exist_ok=True)
    run_dir = os.path.join(out_dir, "run")
    import shutil

    shutil.rmtree(run_dir, ignore_errors=True)  # metrics.jsonl appends

    import blvm_tpu.data.datasets as my_datasets

    my_datasets.DATASETS["synth"] = cc.synth_namespace(paths)

    # deterministic-mean posterior sampling, matching the torch leg's patch
    if cfg["patch_rsample"]:
        import importlib

        # same module the per-family parity tests patch (rsample -> mean)
        mod = importlib.import_module(
            {
                "vrnn": "blvm_tpu.models.vrnn",
                "srnn": "blvm_tpu.models.srnn",
                "stcn": "blvm_tpu.models.stcn.stcn",
                # the RSSM cell is the sampling site for CWVAE (rssm.py)
                "cwvae": "blvm_tpu.modules.rssm",
            }[cfg["transplant"]]
        )
        mod.rsample_gaussian = lambda key, mu, sd: mu

    # record the batch-plan signature: every (x, x_sl) batch the loaders yield,
    # in order (the first is the driver's warmup/summary fetch, mirroring the
    # reference's `next(iter(train_loader))` — experiment_lstm_audio.py:154)
    batches = []
    from blvm_tpu.data.dataloader import DataLoader

    orig_iter = DataLoader.__iter__

    def recording_iter(self):
        for batch in orig_iter(self):
            payload, meta = batch
            # audio: ((x, x_sl), meta); asr two-modality: (((x, x_sl), (y, y_sl)), meta)
            first = payload[0] if isinstance(payload[0], (tuple, list)) else payload
            x, x_sl = first
            batches.append([int(v) for v in x_sl])
            yield batch

    DataLoader.__iter__ = recording_iter

    # record per-step losses (train + eval, in consumption order) — the
    # torch leg records the same per forward, so the two step-loss sequences
    # compare 1:1 (DeferredMetrics delays the fetch but preserves order)
    step_losses = []
    from blvm_tpu.evaluation import Tracker

    orig_update = Tracker.update

    def recording_update(self, metrics, source=None, **kw):
        for m in metrics:
            if getattr(m, "name", None) == "loss":
                step_losses.append(float(m.value))
        return orig_update(self, metrics, source=source, **kw)

    Tracker.update = recording_update

    driver = os.path.join(cc.REPO, "experiments", cfg["driver"])
    sys.argv = [
        driver, *cfg["cli"],
        # the reference's Tracker.epochs has an exclusive-stop off-by-one
        # (range(start, stop) — tracker.py:233: `--epochs N` runs N-1 epochs);
        # ours is inclusive (documented in MIGRATION.md), so align the horizon
        "--epochs", str(int(epochs_override) if epochs_override else cfg["epochs"] - 1),
        "--test_every", str(cfg["test_every"]),
        "--seed", str(cfg["seed"]),
        "--n_devices", "1",
        "--sampler_shared_rng", "true",
        "--init_checkpoint", init_dir,
        "--run_dir", run_dir,
        *cfg.get("jax_extra", ["--generate_frames", "0"]),
        # cwvae needs exact-T batches (bucket_multiple=1): its channel-wise
        # GroupNorm normalizes over the full padded time axis, so any padding
        # beyond the reference's pad-to-batch-max shifts the loss (~8e-5
        # measured at 512). The other families' losses are bucket-invariant.
        "--bucket_multiple", str(cfg.get("bucket_multiple", 512)),
    ]
    runpy.run_path(driver, run_name="__main__")

    epochs = [json.loads(line) for line in open(os.path.join(run_dir, "metrics.jsonl"))]
    cc.write_json(
        os.path.join(out_dir, "jax_trace.json"),
        {"batches": batches, "epochs": epochs, "step_losses": step_losses, "family": family},
    )
    print(f"[jax_leg:{family}] {len(batches)} batches, {len(epochs)} epochs logged")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], *(sys.argv[4:5] or []))
