"""Multi-device data parallelism on the virtual 8-device CPU mesh
(SURVEY.md §4: the JAX fake backend for testing a v5e-8 mesh).

Verifies:
* mesh construction and batch/replica shardings,
* the sharded train step runs and matches the single-device step numerically
  (same params in, same loss out — the psum'd gradient path is exercised),
* psum-able metric accumulation across shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.data import synthetic
from ultrasound_modeling_tpu.parallel import mesh as mesh_mod
from ultrasound_modeling_tpu.train import losses, optim
from ultrasound_modeling_tpu.train import step as step_mod
from ultrasound_modeling_tpu.models.resnest import ResNeStUNet

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

H = W = 32
C = 4
BATCH = 8


def _setup():
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    tx = optim.make_direction(clip_norm=1.0)
    step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                    num_classes=3, augment=False,
                                    donate=False)
    sample = jnp.zeros((BATCH, H, W, C), jnp.float32)
    state = step_mod.TrainState.create(model, tx, sample,
                                       jax.random.PRNGKey(0))
    raw = synthetic.make_raw_array(BATCH, seed=0, height=H, width=W, n_disp=C)
    x = jnp.asarray(raw[:, 0, :, :, 1:-1])
    y = jnp.asarray(raw[:, 0, :, :, 0])
    return model, step, state, x, y


def test_mesh_shapes():
    mesh = mesh_mod.make_mesh(n_data=8)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS)


def test_sharded_step_matches_single_device():
    model, step, state, x, y = _setup()
    lr = jnp.float32(1e-3)

    # Single device result.
    s1, loss1, _ = step(state, x, y, lr)

    # Sharded over the 8-device mesh.
    mesh = mesh_mod.make_mesh(n_data=8)
    state_r = mesh_mod.replicate(mesh, state)
    xs, ys = mesh_mod.shard_batch(mesh, x, y)
    s8, loss8, _ = step(state_r, xs, ys, lr)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    # Parameters after one step agree (gradient all-reduce path correct).
    # Tolerance note: psum reduction order differs from a single-device sum;
    # on near-zero gradients Adam's g/sqrt(v) direction can flip sign under
    # that noise, moving a parameter by up to 2*lr — so the bound is 2*lr
    # plus slack, and we additionally require <0.5% of params to be affected.
    l1 = jax.tree.leaves(jax.device_get(s1.params))
    l8 = jax.tree.leaves(jax.device_get(s8.params))
    lr = 1e-3
    n_bad = 0
    n_total = 0
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, atol=2.2 * lr)
        n_bad += int(np.sum(np.abs(a - b) > 1e-4))
        n_total += a.size
    assert n_bad / n_total < 0.005, (n_bad, n_total)


def test_batch_sharding_layout():
    mesh = mesh_mod.make_mesh(n_data=8)
    x = jnp.zeros((16, 8, 8, 2))
    xs = mesh_mod.shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(mesh_mod.DATA_AXIS)
    # each device holds 1/8 of the batch
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 8, 8, 2)


class TestTensorParallel:
    """Megatron-style TP over the 'model' axis for the transformer stack:
    sharding specs + dp x tp train step matching the single-device step."""

    def _tiny_transunet(self):
        from ultrasound_modeling_tpu.models.transunet import TransUNet
        return TransUNet(num_classes=3, hidden_size=64, num_heads=4,
                         num_layers=2, mlp_dim=128, grid=(4, 5),
                         radix=2, kpaths=2)

    def test_tp_specs_match_megatron_pattern(self):
        from jax.sharding import PartitionSpec as P
        model = self._tiny_transunet()
        x = jnp.zeros((2, 64, 80, 10), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, False)
        specs = mesh_mod.tp_param_specs(variables["params"])
        enc = specs["encoder"]["blocks"]["block"]
        # scanned leaves are [L, in, out]
        assert enc["attn"]["query_kernel"] == P(None, None, "model")
        assert enc["attn"]["out_kernel"] == P(None, "model", None)
        assert enc["ffn"]["fc1"]["kernel"] == P(None, None, "model")
        assert enc["ffn"]["fc1"]["bias"] == P(None, "model")
        assert enc["ffn"]["fc2"]["kernel"] == P(None, "model", None)
        assert enc["ffn"]["fc2"]["bias"] == P()
        assert enc["attention_norm"]["scale"] == P()

    def test_dp_tp_step_matches_single_device(self):
        model = self._tiny_transunet()
        tx = optim.make_direction(clip_norm=1.0)
        step = step_mod.make_train_step(model, losses.cce_smooth, tx,
                                        num_classes=3, augment=False,
                                        donate=False)
        b, h, w = 8, 64, 80
        raw = synthetic.make_raw_array(b, seed=0, height=h, width=w,
                                       n_disp=10)
        x = jnp.asarray(raw[:, 0, :, :, 1:-1])
        y = jnp.asarray(raw[:, 0, :, :, 0])
        state = step_mod.TrainState.create(
            model, tx, jnp.zeros((b, h, w, 10), jnp.float32),
            jax.random.PRNGKey(0))

        _, loss_1, _ = step(state, x, y, jnp.float32(1e-3))

        mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
        state_s = mesh_mod.shard_params(mesh, state)
        xs, ys = mesh_mod.shard_batch(mesh, x, y)
        new_state, loss_tp, _ = step(state_s, xs, ys, jnp.float32(1e-3))
        np.testing.assert_allclose(float(loss_tp), float(loss_1),
                                   rtol=2e-5, atol=2e-6)
        assert int(new_state.step) == 1
        # Param update matches the single-device step.
        g1 = step(state, x, y, jnp.float32(1e-3))[0].params
        gt = new_state.params
        for (p1, a), (p2, b_) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(g1),
                       key=lambda kv: str(kv[0])),
                sorted(jax.tree_util.tree_leaves_with_path(gt),
                       key=lambda kv: str(kv[0]))):
            # Adam divides by sqrt(nu): cross-shard reduction order flips
            # the update sign on noise-level gradients, so compare with an
            # Adam-step-scaled tolerance (lr=1e-3 bounds one update).
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=5e-3, atol=2.5e-3,
                err_msg=str(p1))


def test_cli_train_dp_tp(tmp_path):
    """End-to-end: CLI train with --n-devices 4 --tp 2 on the virtual mesh."""
    import sys
    import unittest.mock as mock
    from ultrasound_modeling_tpu import cli
    argv = ["cli", "train", "--model", "transunet", "--synthetic",
            "--epochs", "1", "--batch-size", "8", "--n-devices", "4",
            "--tp", "2", "--log-dir", str(tmp_path)]
    # Tiny model via TOML so the CPU compile stays fast.
    cfgf = tmp_path / "tiny.toml"
    cfgf.write_text(
        "[model]\nname = 'transunet'\nhidden_size = 64\nnum_heads = 4\n"
        "num_layers = 2\nmlp_dim = 128\ngrid = [4, 5]\nradix = 2\n"
        "kpaths = 2\nimg_size = [64, 80]\n"
        "[train]\nbatch_size = 8\nepochs = 1\n")
    argv += ["--config", str(cfgf)]
    with mock.patch.object(sys, "argv", argv):
        cli.main()


class TestPipelineParallel:
    """GPipe pipeline over the 'model' axis for the scanned transformer
    stack (parallel/pipeline.py): forward/step equivalence vs the local
    lax.scan path, with stage-sharded layer params."""

    def _models(self, mesh, num_micro=4):
        from ultrasound_modeling_tpu.models.transunet import TransUNet
        kw = dict(num_classes=3, hidden_size=64, num_heads=4, num_layers=4,
                  mlp_dim=128, grid=(4, 5), radix=2, kpaths=2)
        return (TransUNet(**kw),
                TransUNet(**kw, pp_mesh=mesh, pp_micro=num_micro))

    def test_pp_specs(self):
        from jax.sharding import PartitionSpec as P
        from ultrasound_modeling_tpu.parallel.pipeline import pp_param_specs
        mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
        model, _ = self._models(mesh)
        x = jnp.zeros((2, 64, 80, 10), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, False)
        specs = pp_param_specs(variables["params"])
        enc = specs["encoder"]["blocks"]["block"]
        assert enc["attn"]["query_kernel"] == P("model")
        assert enc["ffn"]["fc1"]["kernel"] == P("model")
        assert specs["encoder"]["encoder_norm"]["scale"] == P()
        assert specs["decoder"]["conv_more"]["kernel"] == P()

    def test_pp_forward_matches_scanned(self):
        from ultrasound_modeling_tpu.parallel.pipeline import shard_params_pp
        mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
        m_ref, m_pp = self._models(mesh)
        x = jnp.asarray(np.random.RandomState(0).randn(8, 64, 80, 10),
                        jnp.float32)
        v = jax.jit(m_ref.init, static_argnums=(2,))(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, False)
        ref = jax.jit(lambda v, x: m_ref.apply(v, x, False))(v, x)
        v_pp = shard_params_pp(mesh, v)
        x_sh = mesh_mod.shard_batch(mesh, x)
        out = jax.jit(lambda v, x: m_pp.apply(v, x, False))(v_pp, x_sh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-6)

    def test_dp_pp_step_matches_single_device(self):
        from ultrasound_modeling_tpu.parallel.pipeline import shard_params_pp
        mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
        m_ref, m_pp = self._models(mesh)
        tx = optim.make_direction(clip_norm=1.0)
        b, h, w = 8, 64, 80
        raw = synthetic.make_raw_array(b, seed=0, height=h, width=w,
                                       n_disp=10)
        x = jnp.asarray(raw[:, 0, :, :, 1:-1])
        y = jnp.asarray(raw[:, 0, :, :, 0])
        state = step_mod.TrainState.create(
            m_ref, tx, jnp.zeros((b, h, w, 10), jnp.float32),
            jax.random.PRNGKey(0))

        step_ref = step_mod.make_train_step(m_ref, losses.cce_smooth, tx,
                                            num_classes=3, augment=False,
                                            donate=False)
        step_pp = step_mod.make_train_step(m_pp, losses.cce_smooth, tx,
                                           num_classes=3, augment=False,
                                           donate=False)
        s1, loss1, _ = step_ref(state, x, y, jnp.float32(1e-3))

        state_pp = shard_params_pp(mesh, state)
        xs, ys = mesh_mod.shard_batch(mesh, x, y)
        s2, loss2, _ = step_pp(state_pp, xs, ys, jnp.float32(1e-3))
        np.testing.assert_allclose(float(loss2), float(loss1),
                                   rtol=2e-5, atol=2e-6)
        assert int(s2.step) == 1
        # Stacked layer params stay stage-sharded after the update.
        qk = s2.params["encoder"]["blocks"]["block"]["attn"]["query_kernel"]
        assert qk.sharding.spec[0] == "model"
        for a, b_ in zip(jax.tree.leaves(jax.device_get(s1.params)),
                         jax.tree.leaves(jax.device_get(s2.params))):
            np.testing.assert_allclose(b_, a, atol=2.5e-3)


class TestTpPpComposition:
    """3-axis (data, model, pipe) mesh: Megatron TP inside each GPipe
    stage.  Specs put the stacked layer axis on 'pipe' AND the Megatron
    row/column axis on 'model'; the step matches single-device."""

    def _models(self, mesh, num_micro=4):
        from ultrasound_modeling_tpu.models.transunet import TransUNet
        kw = dict(num_classes=3, hidden_size=64, num_heads=4, num_layers=4,
                  mlp_dim=128, grid=(4, 5), radix=2, kpaths=2)
        return (TransUNet(**kw),
                TransUNet(**kw, pp_mesh=mesh, pp_micro=num_micro))

    def test_pp_tp_specs(self):
        from jax.sharding import PartitionSpec as P
        from ultrasound_modeling_tpu.parallel.pipeline import (
            pp_tp_param_specs)
        mesh = mesh_mod.make_mesh(n_data=2, n_model=2, n_pipe=2)
        assert mesh.axis_names == ("data", "model", "pipe")
        model, _ = self._models(mesh)
        x = jnp.zeros((2, 64, 80, 10), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, False)
        specs = pp_tp_param_specs(variables["params"])
        enc = specs["encoder"]["blocks"]["block"]
        assert enc["attn"]["query_kernel"] == P("pipe", None, "model")
        assert enc["ffn"]["fc2"]["kernel"] == P("pipe", "model", None)
        assert enc["attention_norm"]["scale"] == P("pipe", None)
        assert specs["decoder"]["conv_more"]["kernel"] == P()

    def test_dp_tp_pp_step_matches_single_device(self):
        from ultrasound_modeling_tpu.parallel.pipeline import (
            shard_params_pp_tp)
        mesh = mesh_mod.make_mesh(n_data=2, n_model=2, n_pipe=2)
        m_ref, m3 = self._models(mesh)
        tx = optim.make_direction(clip_norm=1.0)
        b, h, w = 8, 64, 80
        raw = synthetic.make_raw_array(b, seed=0, height=h, width=w,
                                       n_disp=10)
        x = jnp.asarray(raw[:, 0, :, :, 1:-1])
        y = jnp.asarray(raw[:, 0, :, :, 0])
        state = step_mod.TrainState.create(
            m_ref, tx, jnp.zeros((b, h, w, 10), jnp.float32),
            jax.random.PRNGKey(0))
        step_ref = step_mod.make_train_step(m_ref, losses.cce_smooth, tx,
                                            num_classes=3, augment=False,
                                            donate=False)
        step3 = step_mod.make_train_step(m3, losses.cce_smooth, tx,
                                         num_classes=3, augment=False,
                                         donate=False)
        s1, loss1, _ = step_ref(state, x, y, jnp.float32(1e-3))

        state3 = shard_params_pp_tp(mesh, state)
        xs, ys = mesh_mod.shard_batch(mesh, x, y)
        s2, loss2, _ = step3(state3, xs, ys, jnp.float32(1e-3))
        np.testing.assert_allclose(float(loss2), float(loss1),
                                   rtol=2e-5, atol=2e-6)
        qk = s2.params["encoder"]["blocks"]["block"]["attn"]["query_kernel"]
        assert qk.sharding.spec[0] == "pipe"
        assert "model" in (qk.sharding.spec + (None,))[:3]
        for a, b_ in zip(jax.tree.leaves(jax.device_get(s1.params)),
                         jax.tree.leaves(jax.device_get(s2.params))):
            np.testing.assert_allclose(b_, a, atol=2.5e-3)


def test_cli_train_dp_tp_pp(tmp_path):
    """End-to-end: CLI train with --n-devices 2 --tp 2 --pp 2 (3-axis)."""
    import sys
    import unittest.mock as mock
    from ultrasound_modeling_tpu import cli
    cfgf = tmp_path / "tiny.toml"
    cfgf.write_text(
        "[model]\nname = 'transunet'\nhidden_size = 64\nnum_heads = 4\n"
        "num_layers = 2\nmlp_dim = 128\ngrid = [4, 5]\nradix = 2\n"
        "kpaths = 2\nimg_size = [64, 80]\n"
        "[train]\nbatch_size = 8\nepochs = 1\n")
    argv = ["cli", "train", "--model", "transunet", "--synthetic",
            "--epochs", "1", "--batch-size", "8", "--n-devices", "2",
            "--tp", "2", "--pp", "2", "--log-dir", str(tmp_path),
            "--config", str(cfgf)]
    with mock.patch.object(sys, "argv", argv):
        cli.main()


def test_cli_train_dp_pp(tmp_path):
    """End-to-end: CLI train with --n-devices 4 --pp 2 on the virtual mesh."""
    import sys
    import unittest.mock as mock
    from ultrasound_modeling_tpu import cli
    cfgf = tmp_path / "tiny.toml"
    cfgf.write_text(
        "[model]\nname = 'transunet'\nhidden_size = 64\nnum_heads = 4\n"
        "num_layers = 2\nmlp_dim = 128\ngrid = [4, 5]\nradix = 2\n"
        "kpaths = 2\nimg_size = [64, 80]\n"
        "[train]\nbatch_size = 8\nepochs = 1\n")
    argv = ["cli", "train", "--model", "transunet", "--synthetic",
            "--epochs", "1", "--batch-size", "8", "--n-devices", "4",
            "--pp", "2", "--log-dir", str(tmp_path),
            "--config", str(cfgf)]
    with mock.patch.object(sys, "argv", argv):
        cli.main()


def test_spatial_partition_step_matches_single_device():
    """Sequence/context parallelism for conv models: batch over 'data' AND
    height over 'model' (GSPMD halo exchange).  One train step matches the
    single-device step."""
    model, step, state, x, y = _setup()
    lr = jnp.float32(1e-3)
    _, loss1, _ = step(state, x, y, lr)

    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    state_r = mesh_mod.replicate(mesh, state)
    xs, ys = mesh_mod.shard_batch_spatial(mesh, x, y)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(
        mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS)
    s_sp, loss_sp, _ = step(state_r, xs, ys, lr)
    np.testing.assert_allclose(float(loss_sp), float(loss1), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(
                        step(state, x, y, lr)[0].params)),
                    jax.tree.leaves(jax.device_get(s_sp.params))):
        np.testing.assert_allclose(a, b, atol=2.5e-3)


def test_dp_multistep_batchnorm_trajectory_matches_single_device():
    """20-step DP-vs-single-device training trajectory for a BatchNorm
    family (VERDICT r3 weak #4): the one place DP could silently diverge
    from single-device training is BatchNorm statistics — the sharded step
    computes sync-BN stats over the GLOBAL batch (train/step.py docstring;
    the sync behaviour the reference contemplated, Decoder.py:330-331),
    which must equal the single-device stats on the same global batch.
    One step can't see slow drift; this pins the multi-step trajectory:
    per-step losses, final running batch_stats, and final params."""
    model, step, state, x0, y0 = _setup()
    lr = jnp.float32(1e-3)
    n_steps = 20

    # Deterministic varied data per step, shared by both paths.
    batches = []
    for i in range(n_steps):
        raw = synthetic.make_raw_array(BATCH, seed=100 + i, height=H,
                                       width=W, n_disp=C)
        batches.append((jnp.asarray(raw[:, 0, :, :, 1:-1]),
                        jnp.asarray(raw[:, 0, :, :, 0])))

    mesh = mesh_mod.make_mesh(n_data=8)

    # --- crisp sync-BN semantics, no drift confounder: ONE step from the
    # identical initial state must produce near-identical new batch_stats
    # (only psum reduction-order noise).  Per-replica BN would compute each
    # device's stats over 1 sample instead of the global 8 — O(batch-std)
    # ~ O(0.1-1) differences.
    x, y = batches[0]
    s1_one, _, _ = step(state, x, y, lr)
    xs, ys = mesh_mod.shard_batch(mesh, x, y)
    s8_one, _, _ = step(mesh_mod.replicate(mesh, state), xs, ys, lr)
    for (p, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(
                jax.device_get(s1_one.batch_stats)),
                key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(
                jax.device_get(s8_one.batch_stats)),
                key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5,
                                   err_msg=str(p))

    # --- 20-step trajectory -------------------------------------------------
    s1 = state
    losses_1 = []
    for x, y in batches:
        s1, loss, _ = step(s1, x, y, lr)
        losses_1.append(float(loss))

    s8 = mesh_mod.replicate(mesh, state)
    losses_8 = []
    for x, y in batches:
        xs, ys = mesh_mod.shard_batch(mesh, x, y)
        s8, loss, _ = step(s8, xs, ys, lr)
        losses_8.append(float(loss))

    # Loss trajectory: agreement at every step (tolerance grows with the
    # accumulated Adam noise from differing psum reduction order).
    np.testing.assert_allclose(losses_8, losses_1, rtol=5e-3)
    assert int(s8.step) == n_steps

    # Final BatchNorm running statistics after 20 steps.  Envelope: Adam's
    # direction sign-flips on noise-level gradients move params up to
    # ~n_steps*lr = 0.02 apart (measured drift 0.015), and the stats EMA
    # tracks activations of the drifted params — measured stats delta 0.024
    # against stats magnitudes ~2.  The bound 0.08 is 3x the measured noise
    # and >10x below the O(0.1-1) per-replica-BN failure signature this
    # test exists to catch.
    bs1 = jax.device_get(s1.batch_stats)
    bs8 = jax.device_get(s8.batch_stats)
    flat1 = sorted(jax.tree_util.tree_leaves_with_path(bs1),
                   key=lambda kv: str(kv[0]))
    flat8 = sorted(jax.tree_util.tree_leaves_with_path(bs8),
                   key=lambda kv: str(kv[0]))
    assert len(flat1) == len(flat8) and len(flat1) > 0
    for (p, a), (_, b) in zip(flat1, flat8):
        np.testing.assert_allclose(b, a, atol=0.08, err_msg=str(p))

    # Final params stay within the accumulated Adam-noise envelope
    # (measured max drift 0.015 after 20 steps at lr 1e-3).
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(b, a, atol=0.05)
