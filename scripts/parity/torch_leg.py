"""Torch leg of the convergence parity harness: run the ACTUAL reference
driver script (``/root/reference/experiments/experiment_<family>_audio.py``)
on the synthetic dataset, recording

  * the model's INITIAL state_dict (captured at the first forward, before any
    update) transplanted into our flax layout and saved as a model checkpoint
    our ``--init_checkpoint`` can load,
  * every forward call: (training?, x_sl list, loss) — per-step trajectory +
    batch-plan signature,
  * every ``wandb.log`` payload — the per-epoch aggregated metrics the
    reference's Tracker computes (``tracker.py:364-375``).

Run in a fresh process with env: ``PYTORCH_JIT=0`` (so runtime rsample patches
reach the VRNN cell), ``JAX_PLATFORMS=cpu`` (flax serialization of the
transplant).

Usage: python torch_leg.py <family> <out_dir> [epochs_override]
"""

import copy
import importlib
import json
import os
import runpy
import sys
import types
import wave as wave_mod

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import convergence_common as cc  # noqa: E402

sys.path.insert(0, cc.REPO)  # for tests.parity transplant helpers

REFERENCE_DRIVERS = "/root/reference/experiments"


def wav_stub_fns():
    """torchaudio.load/info over stdlib ``wave`` — PCM16 mono, /32768 scaling
    (torchaudio's int16 normalization; matches our native decoder,
    blvm_tpu/data/loaders.py:50)."""
    import torch

    def load(path):
        with wave_mod.open(path, "rb") as w:
            n = w.getnframes()
            data = np.frombuffer(w.readframes(n), "<i2").astype(np.float32) / 32768.0
            return torch.from_numpy(data.copy()).reshape(1, -1), w.getframerate()

    def info(path):
        with wave_mod.open(path, "rb") as w:
            return types.SimpleNamespace(
                sample_rate=w.getframerate(),
                num_channels=w.getnchannels(),
                bits_per_sample=8 * w.getsampwidth(),
                encoding="PCM_S",
                num_frames=w.getnframes(),
            )

    return load, info


def main(family: str, out_dir: str, epochs_override=None):
    cfg = cc.family_config(family)
    if epochs_override:  # short smoke runs while developing a family config
        cfg = dict(cfg, epochs=int(epochs_override))
    paths = cc.make_dataset()
    os.makedirs(out_dir, exist_ok=True)

    import torch

    # --- optional double-precision control (TORCH_LEG_F64=1) ---------------
    # Re-runs the SAME reference driver with f64 parameters/activations (same
    # seed, same batch plan). Comparing the f32 and f64 torch trajectories
    # bounds torch's own precision sensitivity over the horizon — the yardstick
    # for whether a jax-f32-vs-torch-f32 divergence is update noise or drift.
    f64 = os.environ.get("TORCH_LEG_F64", "") == "1"
    if f64:
        torch.set_default_dtype(torch.float64)

    # --- reference package with stubs (reference_loader installs torchinfo/
    # blessed/wandb/torchaudio/... stubs, then imports blvm) ----------------
    from tests.parity import reference_loader as rl

    blvm = rl.load_reference()

    # flesh out the stub modules IN PLACE (blvm modules hold references)
    load_fn, info_fn = wav_stub_fns()
    ta = sys.modules["torchaudio"]
    ta.load, ta.info = load_fn, info_fn

    trace = {"steps": [], "logs": [], "family": family}
    captured = {"model": None, "init_state": None}

    wandb = sys.modules["wandb"]

    class _Audio:
        def __init__(self, *a, **k):
            pass

    class _Run:
        id, project, entity, dir, resumed = "convergence", "parity", None, "/", False

    wandb.init = lambda *a, **k: _Run()
    wandb.run = _Run()
    # blvm/utils/wandb.py:60 annotates with wandb.apis.public.Run at import time
    wandb.apis = types.SimpleNamespace(public=types.SimpleNamespace(Run=object))
    wandb.wandb_run = types.SimpleNamespace(Run=object)
    wandb.save = lambda *a, **k: None
    wandb.watch = lambda model, *a, **k: captured.__setitem__("model", model)

    def recording_log(payload, *a, **k):
        payload = cc.sanitize(payload)
        # lr-through-optimizer-state probe: the reference WaveNet driver logs
        # no lr at all (and builds no scheduler — the shared --lr_scheduler
        # flag is parsed but dead there, experiment_wavenet_audio.py:187), so
        # record the optimizer's actual param-group lr whenever the driver's
        # own payload lacks one. Gives every family an lr series to compare.
        if (
            captured.get("optimizer") is not None
            and "lr" not in payload
            and "learning_rate" not in payload
            and not any(isinstance(v, dict) and ("lr" in v or "learning_rate" in v) for v in payload.values())
        ):
            payload["learning_rate"] = float(captured["optimizer"].param_groups[0]["lr"])
        trace["logs"].append(payload)

    wandb.log = recording_log
    wandb.Audio = _Audio

    # capture the driver's optimizer instance for the lr probe above
    _orig_opt_init = torch.optim.Optimizer.__init__

    def _capturing_opt_init(self, *a, **k):
        _orig_opt_init(self, *a, **k)
        captured["optimizer"] = self

    torch.optim.Optimizer.__init__ = _capturing_opt_init

    if "rich" not in sys.modules:
        try:
            import rich  # noqa: F401
        except ImportError:
            mod = types.ModuleType("rich")
            mod.print = print
            sys.modules["rich"] = mod

    torch.cuda.set_device = lambda *a, **k: None  # driver calls it even on cpu

    # the blessed stub's Terminal answers every attr with an identity lambda;
    # the Tracker's console line also needs an integer .width
    class _Terminal:
        width = 200

        def __getattr__(self, name):
            return lambda s="": s

    import blvm.evaluation.tracker as ref_tracker

    ref_tracker.Terminal = _Terminal

    # --- dataset registry injection ---------------------------------------
    import blvm.data.datasets as ref_datasets

    ref_datasets.DATASETS["synth"] = cc.synth_namespace(paths)

    # --- deterministic-mean posterior sampling (both legs patch the same) --
    if cfg["patch_rsample"]:
        mod_name = cfg.get("torch_rsample_module") or cfg["ref_model"].split(":")[0]
        ref_mod = importlib.import_module(mod_name)
        ref_mod.rsample_gaussian = lambda mu, sd: mu

    if cfg.get("asr"):
        # (0) reference_loader stubs editdistance.eval to 0 (it is absent in
        # the image) — WER/CER would read 0.0; install a real Levenshtein
        def _levenshtein(a, b):
            a, b = list(a), list(b)
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        sys.modules["editdistance"].eval = _levenshtein

        # (a) force num_batches=None on the train sampler: the CLI cannot
        # disable fixed-count epochs (0 yields empty epochs) and the
        # reference's num_batches buffer handling has a result-clobbering bug
        # (sample_batches() recursion return overwritten at length_samplers.py
        # tail), so its semantics are not reproducible by a correct
        # implementation — both legs run plain one-sweep epochs instead.
        import blvm.data.samplers.length_samplers as ref_ls

        orig_ts_init = ref_ls.LengthTrainSampler.__init__

        def ts_init(self, *a, **k):
            k["num_batches"] = None
            orig_ts_init(self, *a, **k)

        ref_ls.LengthTrainSampler.__init__ = ts_init

        # (b) the reference ASR driver hardcodes two extra TIMIT test sources
        # under /data/research (experiment_asr_ctc.py:120-123); redirect them
        # to the synthetic male/female splits. Our driver evals the same files
        # via --extra_test_sources (the tracker keys sections by the dataset's
        # resolved source path, so the section names match exactly).
        redirects = {
            "test_male.txt": os.path.join(cc.DATA_DIR, "male.txt"),
            "test_female.txt": os.path.join(cc.DATA_DIR, "female.txt"),
        }

        def redirect(src):
            if isinstance(src, str) and src.startswith("/data/research"):
                return redirects[os.path.basename(src)]
            return src

        import blvm.data.base_dataset as ref_ds

        orig_bd_init = ref_ds.BaseDataset.__init__

        def bd_init(self, source, *a, **k):
            orig_bd_init(self, redirect(source), *a, **k)

        ref_ds.BaseDataset.__init__ = bd_init
        orig_es_init = ref_ls.LengthEvalSampler.__init__

        def es_init(self, source, *a, **k):
            orig_es_init(self, redirect(source), *a, **k)

        ref_ls.LengthEvalSampler.__init__ = es_init

    # --- record every forward (class-level wrap; instance made by driver) --
    mod_name, cls_name = cfg["ref_model"].split(":")
    ref_cls = getattr(importlib.import_module(mod_name), cls_name)
    orig_forward = ref_cls.forward

    def recording_forward(self, x, x_sl, *a, **k):
        if captured["init_state"] is None:
            init_override = os.environ.get("TORCH_LEG_INIT")
            if init_override:
                # precision-control mode: identical INIT to the recorded f32
                # run (f64 init would draw different RNG values — the dtype
                # changes the sampler), cast to the active default dtype
                sd = torch.load(init_override, weights_only=True)
                self.load_state_dict(
                    {k: v.to(torch.get_default_dtype()) if v.is_floating_point() else v for k, v in sd.items()}
                )
            captured["model"] = self
            captured["init_state"] = copy.deepcopy(self.state_dict())
        if f64 and hasattr(x, "dtype") and x.dtype == torch.float32:
            x = x.double()  # loaders yield f32; the f64 model consumes f64
        out = orig_forward(self, x, x_sl, *a, **k)
        x_sl_list = [int(v) for v in (x_sl.tolist() if hasattr(x_sl, "tolist") else x_sl)]
        trace["steps"].append(
            {"training": bool(self.training), "x_sl": x_sl_list, "loss": float(out[0].detach())}
        )
        return out

    ref_cls.forward = recording_forward

    # --- run the reference driver script, verbatim -------------------------
    driver = os.path.join(REFERENCE_DRIVERS, cfg["driver"])
    sys.argv = [driver, *cfg["cli"], *cfg.get("torch_extra", []), "--epochs", str(cfg["epochs"]),
                "--test_every", str(cfg["test_every"]), "--seed", str(cfg["seed"])]
    runpy.run_path(driver, run_name="__main__")

    # --- transplant initial weights into our layout and save ---------------
    assert captured["init_state"] is not None, "reference driver never ran a forward"
    sd = captured["init_state"]
    kind = cfg["transplant"]
    if kind == "lstm":
        from tests.parity.test_parity_lstm import transplant

        params = transplant(sd, num_layers=cfg["model_kwargs"]["num_layers"])
    elif kind == "vrnn":
        from tests.parity.test_parity_vrnn import transplant

        params = transplant(sd)
    elif kind == "srnn":
        from tests.parity.test_parity_srnn import transplant

        params = transplant(sd, smoothing=cfg["model_kwargs"]["smoothing"])
    elif kind == "stcn":
        from tests.parity.test_parity_stcn import transplant

        mk = cfg["model_kwargs"]
        params = transplant(sd, n_layers=mk["n_layers"], latents=tuple(mk["latent_size"]))
    elif kind == "wavenet":
        from tests.parity.test_parity_wavenet import transplant

        mk = cfg["model_kwargs"]
        params = transplant(sd, n_layers=mk["n_layers"], n_stacks=mk["n_stacks"])
    elif kind == "cwvae":
        from tests.parity.test_parity_cwvae import transplant

        mk = cfg["model_kwargs"]
        params = transplant(sd, num_levels=mk["num_levels"], num_blocks=mk["num_blocks"])
    elif kind == "asr":
        from tests.parity.test_parity_lstm_asr import transplant

        mk = cfg["model_kwargs"]
        params = transplant(sd, num_layers=mk["num_layers"], bidirectional=mk["bidirectional"])
    else:
        raise ValueError(kind)

    from flax import serialization

    with open(os.path.join(out_dir, "model_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    # raw torch init too: the f64 precision-control rerun loads it verbatim
    # (TORCH_LEG_INIT) so both precisions start from the identical weights
    torch.save(captured["init_state"], os.path.join(out_dir, "torch_init.pt"))

    cc.write_json(os.path.join(out_dir, "torch_trace.json"), trace)
    n_train = sum(1 for s in trace["steps"] if s["training"])
    print(f"[torch_leg:{family}] {n_train} train steps, {len(trace['steps']) - n_train} eval forwards, "
          f"{len(trace['logs'])} epochs logged")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4] or []))
