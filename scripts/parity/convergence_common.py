"""Shared pieces of the long-horizon convergence parity harness.

The harness runs the ACTUAL torch reference driver
(``/root/reference/experiments/experiment_<family>_audio.py``) and this repo's
driver on the same synthetic dataset for hundreds of optimizer steps — live
length-bucketed sampler, live lr schedule (epoch-stepped MultiStepLR), live
beta/free-nats annealers — from transplanted initial weights, then asserts
the bits/frame trajectories agree. This catches slow training-dynamics drift
(annealer off-by-ones, schedule units, sampler composition) that the 4-step
train-step parity (``tests/parity/test_parity_train_step.py``) cannot see.

Batch-plan identity between the two frameworks is made exact by construction:
``--sampler_shared_rng`` reproduces the reference's global-``random`` sampler
stream (tests/data/test_batchers_samplers.py::TestReferenceSamplerStreamParity)
and both legs assert the per-forward ``x_sl`` signatures match, so the metric
comparison is a true apples-to-apples trajectory comparison.
"""

import json
import os
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DATA_DIR = "/tmp/convergence_data"

# Synthetic-dataset geometry. All lengths DISTINCT: the reference sorts lengths
# with a non-stable argsort while we sort stably — ties could permute pools.
N_TRAIN, N_VALID, N_TEST = 48, 8, 8


def family_config(family: str) -> dict:
    """CLI args shared by both legs, plus per-leg extras.

    Sized so the run is ≥ ~250 optimizer steps with every schedule live inside
    the window: ~13 length-packed batches/epoch (batch_len=16000 over 48 clips
    of 2-6.5k samples), MultiStepLR milestone at epoch 12, VRNN beta/free-nats
    annealers sweeping over the first ~150/100 steps.
    """
    if family == "lstm":
        return dict(
            driver="experiment_lstm_audio.py",
            epochs=25,
            test_every=5,
            seed=1234,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                "--batch_len", "1.0",
                "--stack_size", "64",
                "--hidden_size", "64",
                "--num_layers", "1",
                "--num_mix", "2",
                "--num_bits", "16",
                "--input_coding", "mu_law",
                "--lr", "3e-4",
                "--lr_scheduler", "MultiStepLR",
                "--lr_scheduler_kwargs", '{"milestones": [12], "gamma": 0.5}',
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.lstm:LSTMAudio",
            patch_rsample=False,
            # our LSTMAudio transplant (tests/parity/test_parity_lstm.py)
            transplant="lstm",
            model_kwargs=dict(stack_size=64, hidden_size=64, num_layers=1, num_mix=2, num_bins=2**16),
            metric_keys=("loss", "bpd"),
        )
    if family == "vrnn":
        return dict(
            driver="experiment_vrnn_audio.py",
            epochs=24,
            test_every=5,
            seed=4321,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                "--batch_len", "1.0",
                "--stack_frames", "64",
                "--hidden_size", "64",
                "--latent_size", "16",
                "--likelihood", "DMoL",
                # the reference VRNNAudio DMoL head hardcodes num_mix=10
                # (vrnn.py:464-468) — any other --num_mix crashes it
                "--num_mix", "10",
                "--num_bits", "16",
                "--input_coding", "mu_law",
                "--beta_anneal_steps", "150",
                "--beta_start_value", "0",
                "--free_nats_steps", "100",
                "--free_nats_start_value", "2.0",
                "--lr", "3e-4",
                "--lr_scheduler", "MultiStepLR",
                "--lr_scheduler_kwargs", '{"milestones": [12], "gamma": 0.5}',
                "--max_grad_norm", "3000.0",
                "--max_grad_value", "1000.0",
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.vrnn:VRNNAudio",
            patch_rsample=True,
            transplant="vrnn",
            model_kwargs=dict(likelihood="DMoL", input_size=64, hidden_size=64, latent_size=16, num_mix=10, num_bins=2**16),
            metric_keys=("loss", "bpd", "elbo", "rec", "kl", "beta", "free_nats"),
        )
    if family == "srnn":
        return dict(
            driver="experiment_srnn_audio.py",
            epochs=24,
            test_every=5,
            seed=5151,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                "--batch_len", "1.0",
                "--stack_frames", "64",
                "--hidden_size", "64",
                "--latent_size", "16",
                "--smoothing", "true",
                "--likelihood", "DMoL",
                "--num_mix", "10",
                "--num_bits", "16",
                "--input_coding", "mu_law",
                "--beta_anneal_steps", "150",
                "--beta_start_value", "0",
                "--free_nats_steps", "100",
                "--free_nats_start_value", "2.0",
                "--lr", "3e-4",
                "--lr_scheduler", "MultiStepLR",
                "--lr_scheduler_kwargs", '{"milestones": [12], "gamma": 0.5}',
                # the reference SRNN driver's TIGHT default clips — both BIND
                # (experiment_srnn_audio.py:41-42), exercising the clip chain
                "--max_grad_norm", "3.0",
                "--max_grad_value", "1.0",
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.srnn:SRNNAudio",
            patch_rsample=True,
            transplant="srnn",
            model_kwargs=dict(
                likelihood="DMoL", input_size=64, hidden_size=64, latent_size=16,
                smoothing=True, num_mix=10, num_bins=2**16,
            ),
            metric_keys=("loss", "bpd", "elbo", "rec", "kl", "beta", "free_nats"),
        )
    if family == "stcn":
        return dict(
            driver="experiment_stcn_audio.py",
            epochs=22,
            test_every=5,
            seed=6161,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                # the reference STCN driver's --batch_len is RAW SAMPLES (it
                # lacks the other drivers' seconds conversion) — mirrored
                "--batch_len", "16000",
                "--hidden_size", "32",
                "--latent_size", "16", "8",
                "--num_layers", "3",
                "--num_stack_frames", "1",
                "--dense", "true",
                "--top_down", "true",
                "--precision_posterior", "true",
                "--num_bits", "16",
                "--input_coding", "mu_law",
                # crop length > every example length: RandomSegment stays LIVE
                # in both drivers but always selects start 0 (high = max(T -
                # len, 1) = 1), so batch CONTENT is identical even though the
                # reference crops with torch RNG and we crop with a hash
                "--random_segment_size", "8000",
                "--beta_anneal_steps", "150",
                "--beta_start_value", "0",
                "--free_nats_steps", "100",
                "--free_nats_start_value", "2.0",
                "--lr", "3e-4",
                "--lr_scheduler", "MultiStepLR",
                "--lr_scheduler_kwargs", '{"milestones": [12], "gamma": 0.5}',
                "--max_grad_norm", "3000.0",
                "--max_grad_value", "1000.0",
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.stcn.stcn:STCN",
            patch_rsample=True,
            transplant="stcn",
            lr_log_offset=1,  # STCN logs the post-step (next epoch's) lr
            # the reference STCN driver smoke-forwards the warmup batch once
            # before the loop (model(x, x_sl) — experiment_stcn_audio.py:186,
            # no backward/update): recorded by the torch leg, skipped in the
            # step-by-step comparison
            torch_preloop_forwards=1,
            model_kwargs=dict(
                likelihood="DMoL", n_layers=3, latent_size=(16, 8), res_channels=32,
                dense=True, top_down=True, precision_posterior=True,
            ),
            metric_keys=("loss", "elbo (bpx)", "rec (bpx)", "beta", "free_nats"),
        )
    if family == "cwvae":
        return dict(
            driver="experiment_clockwork_audio.py",
            epochs=22,
            test_every=5,
            seed=8383,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                "--batch_len", "1.0",
                # per-level sizes spelled out: the reference ctor broadcasts
                # ints but NOT length-1 lists (clockwork_vae.py:84-88 would
                # zip-truncate the levels) — nargs="+" makes CLI values lists
                "--hidden_size", "8", "8",
                "--latent_size", "4", "4",
                "--global_size", "0",
                # strides 16*4: level0 = two stride-4 blocks, level1 = (4,1)
                # — uniform num_blocks=2 per level (the reference factors each
                # level's stride into stride_per_layer chunks with stride-1
                # tail blocks, convolutional_coders.py:180-190). Chosen so the
                # TOP level keeps >=30 timesteps per clip: channel-wise
                # GroupNorm over a handful of timesteps is catastrophically
                # ill-conditioned in f32 (a [64,16] probe measured torch
                # f32-vs-f64 at 1.3e-3 maxabs in the top block); at [16,4] our
                # f32 loss agrees with torch f64 to 8e-8
                "--strides", "16", "4",
                "--num_level_layers", "2",
                "--stride_per_layer", "4",
                "--likelihood", "DMoL",
                "--num_mix", "2",
                "--num_bits", "16",
                "--input_coding", "mu_law",
                "--beta_anneal_steps", "150",
                "--beta_start_value", "0",
                "--free_nats_steps", "100",
                "--free_nats_start_value", "2.0",
                "--lr", "3e-4",
                "--lr_scheduler", "MultiStepLR",
                "--lr_scheduler_kwargs", '{"milestones": [12], "gamma": 0.5}',
                "--max_grad_norm", "3000.0",
                "--max_grad_value", "1000.0",
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.clockwork_vae.clockwork_vae:CWVAEAudio",
            patch_rsample=True,
            # the RSSM cell samples via DiagonalGaussianDense.rsample, which
            # resolves rsample_gaussian in blvm.modules.distributions — not in
            # the model module like vrnn/srnn/stcn (rssm.py:100,119)
            torch_rsample_module="blvm.modules.distributions",
            transplant="cwvae",
            # generation is not compared (wandb.Audio sanitizes to None); the
            # torch leg runs the reference's hardcoded 128k-frame generate at
            # every eval epoch, ours skips it to keep the replay test fast
            jax_extra=["--generate_every", "0"],
            # exact-T batches: CWVAE's channel-wise GroupNorm sees padding
            # (loss shifts ~8e-5 at bucket_multiple=512) — see jax_leg.py
            bucket_multiple=1,
            model_kwargs=dict(num_levels=2, num_blocks=2),
            metric_keys=("loss", "elbo (bpt)", "rec (bpt)", "kl (bpt)", "beta", "free_nats"),
        )
    if family == "asr":
        return dict(
            driver="experiment_asr_ctc.py",
            epochs=25,
            test_every=5,  # parsed but unused: the ASR driver evals every epoch
            seed=9494,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                # this driver's --batch_len is SECONDS (sampler gets
                # sample_rate * batch_len; reference experiment_asr_ctc.py:173)
                "--batch_len", "1.0",
                # waveform input: StackTensor(hop) frames — pure torch on the
                # reference side (its LogMelSpectrogram needs torchaudio,
                # which is absent/stubbed in this environment)
                "--data_type", "waveform",
                "--hop_length", "64",
                "--text_type", "phon",
                "--hidden_size", "32",
                "--num_layers", "2",
                "--bidirectional", "true",
                "--sum_directions", "false",
                # dropout OFF: torch and jax PRNGs cannot produce identical
                # masks — the trajectory comparison needs a deterministic step
                "--dropout_prob", "0.0",
                # fixed-count epochs disabled on both sides: the reference's
                # num_batches buffer handling has an overwrite bug (its
                # sample_batches recursion result is clobbered), so its
                # semantics are not reproducible by a correct implementation;
                # the torch leg force-patches num_batches=None (CLI 0 would
                # yield empty epochs there)
                "--num_batches_per_epoch", "0",
                "--lr", "3e-4",
                "--lr_scheduler", "MultiStepLR",
                "--lr_scheduler_kwargs", '{"milestones": [12], "gamma": 0.5}',
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.lstm_asr:SimpleLSTMASR",
            patch_rsample=False,
            transplant="asr",
            # mirror the reference's hardcoded extra test sources (the torch
            # leg redirects /data/research/... to these same files)
            jax_extra=[
                "--extra_test_sources",
                os.path.join(DATA_DIR, "male.txt"),
                os.path.join(DATA_DIR, "female.txt"),
            ],
            # reference-only flags (our CLI has no AMP flag; GradScaler must
            # be disabled on CPU)
            torch_extra=["--use_amp", "false"],
            asr=True,  # torch leg installs the sampler + extra-source patches
            model_kwargs=dict(num_layers=2, bidirectional=True),
            metric_keys=("loss", "wer", "cer"),
        )
    if family == "wavenet":
        return dict(
            driver="experiment_wavenet_audio.py",
            epochs=22,
            test_every=5,
            seed=7272,
            cli=[
                "--dataset", "synth",
                "--device", "cpu",
                "--num_workers", "0",
                "--batch_len", "1.0",
                "--n_layers", "4",
                "--n_stacks", "2",
                "--res_channels", "16",
                "--num_bits", "16",
                "--input_coding", "mu_law",
                "--lr", "3e-4",
                # NO --lr_scheduler here, deliberately: the reference WaveNet
                # driver parses the shared flag but never builds a scheduler
                # (experiment_wavenet_audio.py:187 — fixed Adam lr; contrast
                # the lstm/vrnn/stcn drivers, which call get_lr_scheduler).
                # Passing MultiStepLR therefore ran ASYMMETRIC schedules: our
                # driver honors the flag (capability over the reference,
                # MIGRATION.md) and halved the lr at epoch 12 while torch kept
                # 3e-4 — the round-4 artifact's "mid-horizon excursion"
                # (train/bpd max_rel 1.46e-2 vs <=4.3e-3 for every other
                # family). Both legs now run the reference's effective
                # schedule: constant lr, asserted via the optimizer-state lr
                # probe (torch_leg.recording_log).
                # generation cadence 25 > epochs: the reference's naive AR
                # generate would take hours on CPU; it never fires here
                "--generate_every", "25",
                "--save_checkpoints", "false",
            ],
            ref_model="blvm.models.wavenet.wavenet:WaveNet",
            patch_rsample=False,
            transplant="wavenet",
            jax_extra=["--generate_every", "0"],  # our wavenet driver's flag
            model_kwargs=dict(n_layers=4, n_stacks=2, res_channels=16, num_mix=10, num_bins=2**16),
            metric_keys=("loss", "bpd"),
        )
    raise ValueError(family)


def make_dataset(root: str = DATA_DIR) -> dict:
    """Write WAV clips + train/valid/test source CSVs; return split → CSV path.

    Waveforms carry learnable structure (per-file random sinusoid mixtures +
    small noise) so the loss visibly decreases over the run. Deterministic
    (seeded numpy), all lengths distinct.

    Also writes per-clip TIMIT-format ``.PHN`` transcripts (for the ASR/CTC
    probe family) from a SEPARATE rng stream — the wav/length stream is
    untouched, so the audio families' frozen goldens stay valid — plus an
    ``empty.txt`` header-only CSV (the torch leg redirects the reference ASR
    driver's hardcoded ``/data/research/...`` extra test sources to it).
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(2024)
    phn_rng = np.random.default_rng(2025)
    # a learnable phone inventory subset (real TIMIT phoneset entries)
    phones = ["aa", "ae", "ax", "b", "d", "eh", "ih", "iy", "k", "m", "n", "s", "t", "uw"]
    paths = {}
    offsets = {"train": 0, "valid": 1000, "test": 2000}
    counts = {"train": N_TRAIN, "valid": N_VALID, "test": N_TEST}
    for split, count in counts.items():
        rows = ["filename,length.wav.samples"]
        # distinct lengths 2000..6500, unique across ALL splits (offset per split)
        lengths = (2000 + offsets[split] // 500 + 93 * rng.permutation(count) + np.arange(count)).tolist()
        for i, n in enumerate(lengths):
            n = int(n)
            freqs = rng.uniform(80, 2000, size=3)
            amps = rng.uniform(0.05, 0.25, size=3)
            t = np.arange(n) / 16000.0
            x = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))
            x = x + 0.02 * rng.standard_normal(n)
            pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
            stem = os.path.join(root, f"{split}_{i:03d}")
            with wave.open(stem + ".wav", "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            # TIMIT PHN format: "start end phone" per line (clean_timit strips
            # the alignment columns); 4-9 phones per clip, deterministic
            k = int(phn_rng.integers(4, 10))
            bounds = np.linspace(0, n, k + 1).astype(int)
            with open(stem + ".PHN", "w") as f:
                for j in range(k):
                    f.write(f"{bounds[j]} {bounds[j + 1]} {phones[int(phn_rng.integers(len(phones)))]}\n")
            rows.append(f"{stem},{n}")
        csv_path = os.path.join(root, f"{split}.txt")
        with open(csv_path, "w") as f:
            f.write("\n".join(rows) + "\n")
        paths[split] = csv_path
    # two tiny extra eval splits mirroring the reference ASR driver's
    # hardcoded male/female TIMIT test sources (its experiment_asr_ctc.py
    # hardcodes /data/research paths; the torch leg redirects them here and
    # our driver takes them via --extra_test_sources). All writes use the
    # SEPARATE phn_rng stream so the audio goldens stay valid.
    for extra in ("male", "female"):
        rows = ["filename,length.wav.samples"]
        for i in range(2):
            n = int(phn_rng.integers(2000, 4000))
            freqs = phn_rng.uniform(80, 2000, size=3)
            amps = phn_rng.uniform(0.05, 0.25, size=3)
            t = np.arange(n) / 16000.0
            x = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))
            x = x + 0.02 * phn_rng.standard_normal(n)
            pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
            stem = os.path.join(root, f"{extra}_{i:03d}")
            with wave.open(stem + ".wav", "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            k = int(phn_rng.integers(4, 10))
            bounds = np.linspace(0, n, k + 1).astype(int)
            with open(stem + ".PHN", "w") as f:
                for j in range(k):
                    f.write(f"{bounds[j]} {bounds[j + 1]} {phones[int(phn_rng.integers(len(phones)))]}\n")
            rows.append(f"{stem},{n}")
        with open(os.path.join(root, f"{extra}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
        paths[extra] = os.path.join(root, f"{extra}.txt")
    return paths


def synth_namespace(paths: dict):
    """A DATASETS-registry entry (same shape both sides) for the synthetic set."""
    from types import SimpleNamespace

    return SimpleNamespace(
        name="synth",
        train=paths["train"],
        valid=paths["valid"],
        test=paths["test"],
        valid_sets=[paths["valid"]],
        test_sets=[paths["test"]],
        audio_ext="wav",
        audio_length="length.wav.samples",
    )


def sanitize(obj):
    """Deep-convert a wandb.log / metrics payload to JSON-able scalars."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            v = sanitize(v)
            if v is not None:
                out[str(k)] = v
        return out
    if isinstance(obj, (list, tuple)):
        vals = [sanitize(v) for v in obj]
        return [v for v in vals if v is not None] or None
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return obj
    try:  # torch tensors / numpy scalars
        if hasattr(obj, "numel") and obj.numel() == 1:
            return float(obj)
        if np.ndim(obj) == 0:
            return float(obj)
    except Exception:
        pass
    return None


def write_json(path, payload):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
