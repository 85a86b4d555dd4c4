"""Pipeline parallelism: GPipe microbatch pipelining of the WaveNet residual
stack over a ``pipe`` mesh axis must not change the math — loss, metrics,
gradients and multi-step training trajectories are compared against the
standard (monolithic) forward on one device. The reference has no model
parallelism at all (SURVEY §2.8); equivalence is therefore against our own
standard path, which is itself parity-tested against the torch reference
(tests/parity/test_parity_wavenet.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import PartitionSpec as P

from blvm_tpu.models import STCN, WaveNet
from blvm_tpu.parallel import (
    PIPELINE_PP_RULES,
    STCNPipelineAdapter,
    WaveNetPipelineAdapter,
    from_pipeline_params,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_state,
    to_pipeline_params,
)
from blvm_tpu.training import TrainState, get_optimizer


def flat(tree):
    return {jtu.keystr(k): v for k, v in jtu.tree_leaves_with_path(tree)}


def init_params(model, x, x_sl):
    variables = jax.jit(
        lambda k: model.init({"params": k, "sample": jax.random.PRNGKey(1)}, x, x_sl)
    )(jax.random.PRNGKey(0))
    return variables["params"]


def make_state(model, params):
    tx = get_optimizer("Adam", 1e-3)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx, rng=jax.random.PRNGKey(2))


def std_loss_fn(model):
    def loss_fn(params, rng, batch, scalars):
        loss, mets, _ = model.apply(
            {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng}
        )
        return loss, (mets, None)

    return loss_fn


def make_batch(B, T, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    if ragged:
        x_sl = jnp.asarray(rng.integers(T // 2, T + 1, B), jnp.int32)
    else:
        x_sl = jnp.full((B,), T, jnp.int32)
    return x, x_sl


class TestParamLayout:
    def test_roundtrip_exact(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        x, x_sl = make_batch(2, 64)
        params = init_params(model, x, x_sl)
        pparams = to_pipeline_params(params, 2)
        # stacked stage leaves carry a leading (n_stages,) axis
        gk = pparams["res_stack"]["stages"]["block_0"]["gate_kernel_t"]
        assert gk.shape[0] == 2
        fa, fb = flat(params), flat(from_pipeline_params(pparams, 2))
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)

    def test_stage_assignment_is_whole_stacks(self):
        """Stage s must own blocks [s*bps, (s+1)*bps) in block order."""
        model = WaveNet(n_layers=2, n_stacks=2, res_channels=8, num_mix=2)
        x, x_sl = make_batch(2, 32)
        params = init_params(model, x, x_sl)
        pparams = to_pipeline_params(params, 2)
        for j in range(2):  # blocks per stage = 2
            for s in range(2):
                want = params["res_stack"][f"Conv1dResidualGLU_{s * 2 + j}"]["gate_kernel_t"]
                got = pparams["res_stack"]["stages"][f"block_{j}"]["gate_kernel_t"][s]
                np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_indivisible_stages_raise(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        x, x_sl = make_batch(2, 64)
        params = init_params(model, x, x_sl)
        with pytest.raises(ValueError):
            to_pipeline_params(params, 4)  # 6 blocks % 4 != 0


class TestPipelinedForwardEquivalence:
    @pytest.mark.parametrize("n_micro", [1, 2, 4])
    def test_loss_and_mets_match_standard(self, n_micro):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 64
        x, x_sl = make_batch(B, T)
        params = init_params(model, x, x_sl)

        loss_s, mets_s, _ = jax.jit(
            lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})
        )(params)

        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=n_micro)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, (mets_p, _) = jax.jit(loss_fn)(adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {})

        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mets_p["log_prob"]), np.asarray(mets_s["log_prob"]), rtol=1e-5
        )

    def test_grads_match_standard(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 64
        x, x_sl = make_batch(B, T)
        params = init_params(model, x, x_sl)

        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        g_p = jax.jit(jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(0), batch, {})[0]))(
            adapter.to_pipeline(params)
        )
        g_s = jax.jit(
            jax.grad(
                lambda p: model.apply(
                    {"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)}
                )[0]
            )
        )(params)
        fp, fs = flat(from_pipeline_params(g_p, 2)), flat(g_s)
        assert fp.keys() == fs.keys()
        for k in fs:
            np.testing.assert_allclose(
                np.asarray(fp[k]), np.asarray(fs[k]), rtol=2e-5, atol=1e-7, err_msg=k
            )

    def test_four_stages(self):
        """pipe=4: four single-stack stages, dp=2 x pipe=4 on the 8-dev mesh."""
        model = WaveNet(n_layers=2, n_stacks=4, res_channels=16, num_mix=2)
        B, T = 8, 64
        x, x_sl = make_batch(B, T, seed=1)
        params = init_params(model, x, x_sl)
        loss_s = float(
            jax.jit(
                lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})[0]
            )(params)
        )
        mesh = make_mesh(8, pipe_axis_size=4)
        adapter = WaveNetPipelineAdapter(model, n_stages=4, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, _ = jax.jit(loss_fn)(adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {})
        np.testing.assert_allclose(float(loss_p), loss_s, rtol=1e-6)

    def test_frame_stacked(self):
        """n_stack_frames>1 exercises the stack/unstack glue around the engine."""
        model = WaveNet(n_layers=2, n_stacks=2, res_channels=16, num_mix=2, n_stack_frames=4)
        B, T = 8, 256
        x, x_sl = make_batch(B, T, seed=2)
        params = init_params(model, x, x_sl)
        loss_s, mets_s, _ = jax.jit(
            lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})
        )(params)
        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, (mets_p, _) = jax.jit(loss_fn)(adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {})
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mets_p["log_prob"]), np.asarray(mets_s["log_prob"]), rtol=1e-5
        )

    def test_kernel_size_3(self):
        """k=3 pins the generic d*(k-1) frame-consumption geometry (the k=2
        fast path lowers convs as tap dots; k=3 runs the real dilated conv)."""
        model = WaveNet(n_layers=2, n_stacks=2, res_channels=16, num_mix=2, kernel_size=3)
        B, T = 8, 128
        x, x_sl = make_batch(B, T, seed=3)
        params = init_params(model, x, x_sl)
        loss_s = float(
            jax.jit(
                lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})[0]
            )(params)
        )
        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, _ = jax.jit(loss_fn)(adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {})
        np.testing.assert_allclose(float(loss_p), loss_s, rtol=1e-6)

    def test_validation(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        # stages must divide stacks
        mesh = make_mesh(4, pipe_axis_size=4)
        with pytest.raises(ValueError):
            WaveNetPipelineAdapter(model, n_stages=4, n_micro=2).make_loss_fn(mesh)
        # embedding-input configs unsupported
        emb = WaveNet(n_layers=3, n_stacks=2, res_channels=16, embedding_dim=4, likelihood="categorical")
        with pytest.raises(ValueError):
            WaveNetPipelineAdapter(emb, n_stages=2, n_micro=2)


class TestPipelineTensorComposition:
    """pp x tp: the GPipe shard_map is manual over (data, pipe) with the
    'model' axis left AUTOMATIC, so GSPMD tensor-parallelizes each stage's
    block math from the PIPELINE_PP_TP_RULES parameter shardings — the loss
    and gradients must equal the monolithic single-device forward."""

    def _setup(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 64
        x, x_sl = make_batch(B, T, seed=4)
        params = init_params(model, x, x_sl)
        return model, params, x, x_sl

    def test_loss_and_grads_match_standard(self):
        from blvm_tpu.parallel.pipeline_parallel import PIPELINE_PP_TP_RULES
        from blvm_tpu.parallel.tensor_parallel import tree_shardings

        model, params, x, x_sl = self._setup()
        loss_s, g_s = jax.jit(
            jax.value_and_grad(
                lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})[0]
            )
        )(params)

        mesh = make_mesh(8, pipe_axis_size=2, model_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        pparams = adapter.to_pipeline(params)
        pparams = jax.device_put(pparams, tree_shardings(pparams, mesh, PIPELINE_PP_TP_RULES))
        # the TP rules actually took: gate kernels shard (pipe, -, -, model)
        gk = pparams["res_stack"]["stages"]["block_0"]["gate_kernel_t"]
        assert gk.sharding.spec == P("pipe", None, None, "model")
        rs = pparams["res_stack"]["stages"]["block_0"]["rs_kernel"]
        assert rs.sharding.spec == P("pipe", None, "model", None)

        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, g_p = jax.jit(
            jax.value_and_grad(lambda p: loss_fn(p, jax.random.PRNGKey(0), batch, {})[0])
        )(pparams)
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        fp, fs = flat(from_pipeline_params(jax.device_get(g_p), 2)), flat(g_s)
        assert fp.keys() == fs.keys()
        for k in fs:
            np.testing.assert_allclose(
                np.asarray(fp[k]), np.asarray(fs[k]), rtol=2e-5, atol=1e-7, err_msg=k
            )

    def test_stcn_loss_and_klds_match_standard(self):
        """STCN pp x tp: collect-mode skips computed under TP must feed the
        latent hierarchy the exact monolithic values (loss + per-layer KLs)."""
        from blvm_tpu.parallel.pipeline_parallel import PIPELINE_PP_TP_RULES
        from blvm_tpu.parallel.tensor_parallel import tree_shardings

        model = STCN(n_layers=4, latent_size=(8, 4), n_stacks=2, res_channels=16)
        B, T = 8, 64
        x, x_sl = make_batch(B, T, seed=5)
        params = init_params(model, x, x_sl)
        loss_s, mets_s, _ = jax.jit(
            lambda p: model.apply(
                {"params": p}, x, x_sl, beta=0.7, free_nats=0.1, rngs={"sample": jax.random.PRNGKey(0)}
            )
        )(params)

        mesh = make_mesh(8, pipe_axis_size=2, model_axis_size=2)
        adapter = STCNPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        pparams = adapter.to_pipeline(params)
        pparams = jax.device_put(pparams, tree_shardings(pparams, mesh, PIPELINE_PP_TP_RULES))
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, (mets_p, _) = jax.jit(loss_fn)(
            pparams, jax.random.PRNGKey(0), batch, {"beta": 0.7, "free_nats": 0.1}
        )
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mets_p["kld"]), np.asarray(mets_s["kld"]), rtol=1e-5)

    def test_train_step_matches_single_device(self):
        """3 pp x tp optimizer steps == 3 monolithic single-device steps."""
        from blvm_tpu.parallel.pipeline_parallel import PIPELINE_PP_TP_RULES

        model, params, x, x_sl = self._setup()
        batches = [make_batch(8, 64, seed=10 + t) for t in range(3)]

        mesh1 = make_mesh(1)
        state_s = make_state(model, params)
        step_s = make_train_step(std_loss_fn(model), mesh=mesh1, donate=False)
        losses_s = []
        for bx, bsl in batches:
            state_s, mets = step_s(state_s, {"x": bx, "x_sl": bsl}, {})
            losses_s.append(float(mets["loss"]))

        mesh = make_mesh(8, pipe_axis_size=2, model_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        state_p = make_state(model, adapter.to_pipeline(params))
        state_p = shard_train_state(state_p, mesh, PIPELINE_PP_TP_RULES)
        step_p = make_train_step(adapter.make_loss_fn(mesh), mesh=mesh, donate=False)
        for t, (bx, bsl) in enumerate(batches):
            batch = shard_batch({"x": bx, "x_sl": bsl}, mesh)
            state_p, mets = step_p(state_p, batch, {})
            np.testing.assert_allclose(float(mets["loss"]), losses_s[t], rtol=1e-5)

        fa = flat(jax.device_get(state_s.params))
        fb = flat(from_pipeline_params(jax.device_get(state_p.params), 2))
        for k in fa:
            np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]), rtol=2e-5, atol=1e-6, err_msg=k)


class TestSTCNPipeline:
    """STCN runs the engine in skip_mode='collect': stages hand the every-n-th
    skips to the (replicated) latent hierarchy via finish_from_skips. The
    rng-dependent terms (rsampled z, KLs) must match the monolithic forward
    exactly — same module scopes, same 'sample' stream."""

    def _model(self):
        # 8 blocks, bps=4 at pipe=2, n_latents=2 — bps % n == 0 holds
        return STCN(n_layers=4, latent_size=(8, 4), n_stacks=2, res_channels=16)

    @pytest.mark.parametrize("n_micro", [1, 2])
    def test_loss_and_mets_match_standard(self, n_micro):
        model = self._model()
        B, T = 8, 64
        x, x_sl = make_batch(B, T)
        params = init_params(model, x, x_sl)
        loss_s, mets_s, _ = jax.jit(
            lambda p: model.apply(
                {"params": p}, x, x_sl, beta=0.7, free_nats=0.1, rngs={"sample": jax.random.PRNGKey(0)}
            )
        )(params)

        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = STCNPipelineAdapter(model, n_stages=2, n_micro=n_micro)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, (mets_p, _) = jax.jit(loss_fn)(
            adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {"beta": 0.7, "free_nats": 0.1}
        )
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mets_p["log_prob"]), np.asarray(mets_s["log_prob"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(mets_p["kld"]), np.asarray(mets_s["kld"]), rtol=1e-5)

    def test_grads_match_standard(self):
        model = self._model()
        B, T = 8, 64
        x, x_sl = make_batch(B, T)
        params = init_params(model, x, x_sl)
        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = STCNPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        g_p = jax.jit(jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(0), batch, {})[0]))(
            adapter.to_pipeline(params)
        )
        g_s = jax.jit(
            jax.grad(
                lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})[0]
            )
        )(params)
        fp, fs = flat(from_pipeline_params(g_p, 2)), flat(g_s)
        assert fp.keys() == fs.keys()
        for k in fs:
            np.testing.assert_allclose(
                np.asarray(fp[k]), np.asarray(fs[k]), rtol=2e-5, atol=1e-7, err_msg=k
            )

    def test_train_step_matches_single_device(self):
        model = self._model()
        B, T = 8, 64
        x, x_sl = make_batch(B, T, ragged=False)
        params = init_params(model, x, x_sl)

        def std_stcn_loss(params, rng, batch, scalars):
            loss, mets, _ = model.apply(
                {"params": params}, batch["x"], batch["x_sl"], rngs={"sample": rng}
            )
            return loss, (mets, None)

        mesh1 = make_mesh(1)
        state1 = make_state(model, params)
        step1 = make_train_step(std_stcn_loss, mesh=mesh1, donate=False)

        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = STCNPipelineAdapter(model, n_stages=2, n_micro=2)
        state_p = shard_train_state(
            make_state(model, adapter.to_pipeline(params)), mesh, PIPELINE_PP_RULES
        )
        step_p = make_train_step(adapter.make_loss_fn(mesh), mesh=mesh, donate=False)
        batch_p = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        for _ in range(2):
            state1, mets1 = step1(state1, {"x": x, "x_sl": x_sl}, {})
            state_p, mets_p = step_p(state_p, batch_p, {})
            np.testing.assert_allclose(float(mets_p["loss"]), float(mets1["loss"]), rtol=1e-5)
        fa = flat(state1.params)
        fb = flat(adapter.from_pipeline(jax.device_get(state_p.params)))
        for k in fa:
            np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]), atol=2e-5, err_msg=k)

    def test_validation(self):
        # bps must be a multiple of n_latents: 6 blocks / 2 stages = 3, n=2
        bad = STCN(n_layers=3, latent_size=(8, 4), n_stacks=2, res_channels=16)
        with pytest.raises(ValueError):
            STCNPipelineAdapter(bad, n_stages=2, n_micro=2)
        # stages must divide stacks
        with pytest.raises(ValueError):
            STCNPipelineAdapter(self._model(), n_stages=4, n_micro=2)


class TestPPTrainStep:
    def test_multi_step_matches_single_device(self):
        """3 full optimizer steps dp=2 x pipe=2 == 3 single-device steps."""
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 64
        x, x_sl = make_batch(B, T, ragged=False)
        params = init_params(model, x, x_sl)

        mesh1 = make_mesh(1)
        state1 = make_state(model, params)
        step1 = make_train_step(std_loss_fn(model), mesh=mesh1, donate=False)

        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        state_p = make_state(model, adapter.to_pipeline(params))
        state_p = shard_train_state(state_p, mesh, PIPELINE_PP_RULES)
        # stage params (and their Adam moments) actually landed pipe-sharded
        gk = state_p.params["res_stack"]["stages"]["block_0"]["gate_kernel_t"]
        assert gk.sharding.spec == P("pipe")
        step_p = make_train_step(adapter.make_loss_fn(mesh), mesh=mesh, donate=False)

        batch_p = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        for i in range(3):
            state1, mets1 = step1(state1, {"x": x, "x_sl": x_sl}, {})
            state_p, mets_p = step_p(state_p, batch_p, {})
            np.testing.assert_allclose(float(mets_p["loss"]), float(mets1["loss"]), rtol=1e-5)

        fa = flat(state1.params)
        fb = flat(adapter.from_pipeline(jax.device_get(state_p.params)))
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]), atol=2e-5, err_msg=k)

    def test_optimizer_moments_sharded_over_pipe(self):
        model = WaveNet(n_layers=2, n_stacks=2, res_channels=16, num_mix=2)
        x, x_sl = make_batch(4, 64)
        params = init_params(model, x, x_sl)
        mesh = make_mesh(4, pipe_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        state = shard_train_state(make_state(model, adapter.to_pipeline(params)), mesh, PIPELINE_PP_RULES)
        mus = [
            leaf
            for path, leaf in jtu.tree_leaves_with_path(state.opt_state)
            if "mu" in jtu.keystr(path) and "stages/block_0" in jtu.keystr(path).replace("']['", "/")
        ]
        if not mus:  # keystr formats differ across jax versions — fall back
            mus = [
                leaf
                for path, leaf in jtu.tree_leaves_with_path(state.opt_state)
                if "mu" in jtu.keystr(path) and "block_0" in jtu.keystr(path)
            ]
        assert mus, "no Adam mu leaf found for stages/block_0"
        assert all(m.sharding.spec == P("pipe") for m in mus)


class TestPipelineSeqComposition:
    """pp x sp (round-3 verdict item 4): the adapters turn time shards into
    overlap-window batch rows (seq_windows), so the GPipe engine shards rows
    over the (data, seq) mesh axes — depth AND time sharded together. Loss,
    metrics and gradients must equal the monolithic single-device forward."""

    def test_seq_windows_roundtrip(self):
        from blvm_tpu.parallel.pipeline_parallel import seq_unwindows, seq_windows

        B, skip, overlap, seq, C = 3, 32, 5, 4, 2
        h = jnp.asarray(np.random.default_rng(0).normal(size=(B, skip + overlap, C)), jnp.float32)
        rows = seq_windows(h, seq, overlap)
        assert rows.shape == (B * seq, skip // seq + overlap, C)
        # each row's owned slice is the matching slice of the global skip region
        owned = seq_unwindows(rows[:, overlap:], seq)
        np.testing.assert_array_equal(np.asarray(owned), np.asarray(h[:, overlap:]))
        # each row carries the receptive-field history of its slice
        np.testing.assert_array_equal(
            np.asarray(rows[1, :overlap]), np.asarray(h[0, skip // seq : skip // seq + overlap])
        )

    def test_wavenet_pp_sp_loss_and_grads(self):
        model = WaveNet(n_layers=3, n_stacks=2, res_channels=16, num_mix=3)
        B, T = 8, 64
        x, x_sl = make_batch(B, T)
        params = init_params(model, x, x_sl)

        loss_s, mets_s, _ = jax.jit(
            lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})
        )(params)

        mesh = make_mesh(8, pipe_axis_size=2, seq_axis_size=2)
        adapter = WaveNetPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, (mets_p, _) = jax.jit(loss_fn)(adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {})
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mets_p["log_prob"]), np.asarray(mets_s["log_prob"]), rtol=1e-5
        )

        g_p = jax.jit(jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(0), batch, {})[0]))(
            adapter.to_pipeline(params)
        )
        g_s = jax.jit(
            jax.grad(lambda p: model.apply({"params": p}, x, x_sl, rngs={"sample": jax.random.PRNGKey(0)})[0])
        )(params)
        fp, fs = flat(from_pipeline_params(g_p, 2)), flat(g_s)
        assert fp.keys() == fs.keys()
        for k in fs:
            np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(fs[k]), rtol=2e-5, atol=1e-7, err_msg=k)

    def test_stcn_pp_sp_loss_and_grads(self):
        # STCN: the capacity-bound family this composition exists for
        model = STCN(n_layers=4, latent_size=(8, 4), n_stacks=2, res_channels=16)
        B, T = 8, 64
        x, x_sl = make_batch(B, T)
        params = init_params(model, x, x_sl)
        loss_s, mets_s, _ = jax.jit(
            lambda p: model.apply(
                {"params": p}, x, x_sl, beta=0.7, free_nats=0.1, rngs={"sample": jax.random.PRNGKey(0)}
            )
        )(params)

        mesh = make_mesh(8, pipe_axis_size=2, seq_axis_size=2)
        adapter = STCNPipelineAdapter(model, n_stages=2, n_micro=2)
        loss_fn = adapter.make_loss_fn(mesh)
        batch = shard_batch({"x": x, "x_sl": x_sl}, mesh)
        loss_p, (mets_p, _) = jax.jit(loss_fn)(
            adapter.to_pipeline(params), jax.random.PRNGKey(0), batch, {"beta": 0.7, "free_nats": 0.1}
        )
        np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mets_p["log_prob"]), np.asarray(mets_s["log_prob"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(mets_p["kld"]), np.asarray(mets_s["kld"]), rtol=1e-5)

        g_p = jax.jit(
            jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(0), batch, {"beta": 0.7, "free_nats": 0.1})[0])
        )(adapter.to_pipeline(params))
        g_s = jax.jit(
            jax.grad(
                lambda p: model.apply(
                    {"params": p}, x, x_sl, beta=0.7, free_nats=0.1, rngs={"sample": jax.random.PRNGKey(0)}
                )[0]
            )
        )(params)
        fp, fs = flat(from_pipeline_params(g_p, 2)), flat(g_s)
        assert fp.keys() == fs.keys()
        for k in fs:
            np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(fs[k]), rtol=2e-5, atol=1e-7, err_msg=k)
