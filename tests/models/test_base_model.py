"""BaseModel: kwargs serialization, registry dispatch, summaries, params count."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blvm_tpu.models import CWVAEAudio, LSTMAudio, SRNNAudio, STCN, VRNNAudio, WaveNet, load_model
from blvm_tpu.models.base import count_parameters


class TestInitArguments:
    def test_jsonable_for_all_models(self):
        models = [
            LSTMAudio(stack_size=8, hidden_size=8, num_mix=2),
            WaveNet(n_layers=2, n_stacks=1, res_channels=8, num_mix=2),
            VRNNAudio(input_size=8, hidden_size=8, latent_size=2),
            SRNNAudio(input_size=8, hidden_size=8, latent_size=2),
            STCN(n_layers=2, latent_size=(4,), res_channels=8),
            CWVAEAudio(z_size=2, h_size=8, strides=(4,), num_level_layers=2, stride_per_layer=2),
        ]
        for m in models:
            kwargs = m.init_arguments()
            json.dumps(kwargs)  # must round-trip through JSON
            assert "name" not in kwargs and "parent" not in kwargs

    def test_reconstruct_from_kwargs(self):
        m = WaveNet(n_layers=2, n_stacks=1, res_channels=8, num_mix=2)
        kwargs = json.loads(json.dumps(m.init_arguments()))
        m2 = WaveNet(**{k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()})
        assert m2.n_layers == 2 and m2.res_channels == 8


class TestRegistryDispatch:
    @pytest.mark.parametrize(
        "model",
        [
            LSTMAudio(stack_size=8, hidden_size=8, num_mix=2),
            WaveNet(n_layers=2, n_stacks=1, res_channels=8, num_mix=2),
            VRNNAudio(input_size=8, hidden_size=8, latent_size=2),
        ],
        ids=lambda m: type(m).__name__,
    )
    def test_save_load_by_class_name(self, model, tmp_path):
        args, rngs = model.example_inputs()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), **{k: jax.random.PRNGKey(1) for k in rngs}}, *args
        )
        model.save(str(tmp_path / "ckpt"), variables["params"])
        model2, params2 = load_model(str(tmp_path / "ckpt"))
        assert type(model2).__name__ == type(model).__name__
        assert count_parameters(params2) == count_parameters(variables["params"])

    def test_missing_path_raises(self, tmp_path):
        with pytest.raises(RuntimeError):
            load_model(str(tmp_path / "nope"))


class TestSummary:
    def test_summary_counts_match(self):
        m = LSTMAudio(stack_size=8, hidden_size=8, num_mix=2)
        args, rngs = m.example_inputs()
        variables = m.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, *args)
        n = count_parameters(variables["params"])
        assert f"{n:,}" in m.summary().splitlines()[0]
