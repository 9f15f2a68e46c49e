"""End-to-end smoke: synthetic data, small ResNeSt U-Net, loss decreases.

Uses reduced spatial size (64x64) to keep CPU compile time reasonable; this is
the milestone test from SURVEY.md §7 step 2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.config import default_config
from ultrasound_modeling_tpu.data.pipeline import Dataset
from ultrasound_modeling_tpu.models.resnest import ResNeStUNet
from ultrasound_modeling_tpu.train import losses, metrics, optim
from ultrasound_modeling_tpu.train import step as step_mod


def test_resnest_unet_loss_decreases():
    ds = Dataset.synthetic(n_train=8, n_test=4, height=64, width=64, n_disp=6)
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    tx = optim.make_direction(clip_norm=None)
    loss_fn = losses.class_balanced
    train_step = step_mod.make_train_step(
        model, loss_fn, tx, num_classes=3, augment=False, donate=False)
    sample = jnp.zeros((4, 64, 64, 6))
    state = step_mod.TrainState.create(model, tx, sample, jax.random.PRNGKey(0))

    lr = jnp.float32(1e-3)
    first_losses, last_losses = [], []
    for it in range(12):
        x, y, _ = ds.next_train(4)
        state, loss, probs = train_step(state, x, y, lr)
        if it < 3:
            first_losses.append(float(loss))
        if it >= 9:
            last_losses.append(float(loss))
    assert np.isfinite(last_losses).all()
    assert np.mean(last_losses) < np.mean(first_losses), (
        first_losses, last_losses)


def test_scanned_epoch_matches_loop_losses():
    """The lax.scan'd epoch produces the same loss sequence as the per-step
    loop (same state, same data, augment off)."""
    ds = Dataset.synthetic(n_train=8, n_test=2, height=64, width=64, n_disp=6)
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    tx = optim.make_direction(clip_norm=None)
    loss_fn = losses.class_balanced
    sample = jnp.zeros((4, 64, 64, 6))
    state0 = step_mod.TrainState.create(model, tx, sample,
                                        jax.random.PRNGKey(0))

    step = step_mod.make_train_step(model, loss_fn, tx, augment=False,
                                    donate=False)
    lr = jnp.float32(1e-3)
    state = state0
    loop_losses = []
    for i in range(2):
        x, y = ds.x_tr[i * 4:(i + 1) * 4], ds.y_tr[i * 4:(i + 1) * 4]
        state, loss, _ = step(state, x, y, lr)
        loop_losses.append(float(loss))

    epoch = step_mod.make_epoch_step(model, loss_fn, tx, augment=False,
                                     donate=False)
    xs = ds.x_tr.reshape(2, 4, 64, 64, 6)
    ys = ds.y_tr.reshape(2, 4, 64, 64)
    state2, scan_losses = epoch(state0, xs, ys, lr)
    np.testing.assert_allclose(np.asarray(scan_losses), loop_losses,
                               rtol=1e-5)
    assert int(state2.step) == 2


def test_eval_step_metrics():
    ds = Dataset.synthetic(n_train=4, n_test=4, height=64, width=64, n_disp=6)
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    tx = optim.make_direction(clip_norm=None)
    eval_step = step_mod.make_eval_step(model, losses.class_balanced, 3)
    sample = jnp.zeros((2, 64, 64, 6))
    state = step_mod.TrainState.create(model, tx, sample, jax.random.PRNGKey(0))
    mstate = metrics.zeros(3)
    while True:
        x, y, term = ds.next_test(2)
        mstate, loss, probs = eval_step(state, mstate, x, y)
        if term:
            break
    summary = metrics.summarize(mstate)
    for key in ("precision", "recall", "f1", "mean_iou", "mean_dice",
                "dice_c2", "accuracy", "loss"):
        v = float(summary[key])
        assert np.isfinite(v), key
    assert 0.0 <= float(summary["accuracy"]) <= 1.0


def test_auc_matches_exact_rank_auc(rng):
    """Histogram ROC-AUC vs the exact rank-statistic AUC on random data."""
    import numpy as np
    n = 4000
    y = (rng.uniform(size=n) > 0.6).astype(np.float32)
    # Predictions correlated with truth so AUC is away from 0.5 and 1.0.
    p = np.clip(0.55 * y + 0.45 * rng.uniform(size=n), 0, 1).astype(np.float32)
    state = metrics.update(metrics.zeros(3), jnp.asarray(y), jnp.asarray(p),
                           jnp.float32(0.0))
    got = float(metrics.summarize(state)["auc"])
    pos, neg = p[y > 0.5], p[y <= 0.5]
    exact = float(np.mean(pos[:, None] > neg[None, :])
                  + 0.5 * np.mean(pos[:, None] == neg[None, :]))
    assert abs(got - exact) < 0.01, (got, exact)


def test_auc_perfect_and_random():
    import numpy as np
    y = jnp.asarray(np.repeat([0.0, 1.0], 100))
    p_perfect = jnp.asarray(np.repeat([0.1, 0.9], 100))
    s = metrics.update(metrics.zeros(3), y, p_perfect, jnp.float32(0.0))
    assert float(metrics.summarize(s)["auc"]) > 0.99


def test_adam_mu_bf16_state_and_parity():
    """TrainConfig.adam_mu_dtype='bfloat16' (the round-4 HBM-bytes
    optimization) stores the Adam first moment in bf16 and tracks the f32-mu
    trajectory: mu is an EMA of bf16-computed gradients, so storing it bf16
    perturbs each update well below the grad's own bf16 quantum."""
    model = ResNeStUNet(num_classes=3, radix=2, kpaths=2)
    loss_fn = losses.class_balanced
    sample = jnp.zeros((4, 64, 64, 6))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 6)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 2, size=(4, 64, 64)), jnp.float32)
    lr = jnp.float32(1e-3)

    trajs = {}
    for mu_dtype in (None, "bfloat16"):
        tx = optim.make_direction(clip_norm=None, mu_dtype=mu_dtype)
        step = step_mod.make_train_step(model, loss_fn, tx, augment=False,
                                        donate=False)
        state = step_mod.TrainState.create(model, tx, sample,
                                           jax.random.PRNGKey(0))
        if mu_dtype == "bfloat16":
            adam_state = [s for s in jax.tree_util.tree_leaves(
                state.opt_state, is_leaf=lambda n: hasattr(n, "mu"))
                if hasattr(n := s, "mu")]
            assert adam_state, "no ScaleByAdamState found in opt_state"
            mu_dtypes = {p.dtype for p in
                         jax.tree_util.tree_leaves(adam_state[0].mu)}
            assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}, mu_dtypes
            nu_dtypes = {p.dtype for p in
                         jax.tree_util.tree_leaves(adam_state[0].nu)}
            assert nu_dtypes == {jnp.dtype(jnp.float32)}, nu_dtypes
        traj = []
        for _ in range(6):
            state, loss, _ = step(state, x, y, lr)
            traj.append(float(loss))
        trajs[mu_dtype] = traj
    deltas = [abs(a - b) for a, b in zip(trajs[None], trajs["bfloat16"])]
    assert np.isfinite(trajs["bfloat16"]).all()
    assert max(deltas) < 5e-3, (deltas, trajs)
