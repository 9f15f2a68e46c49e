"""Inference driver + renderer tests: composite probability formula, cascade
masking semantics, batched runner padding, panel rendering smoke."""

import os

import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.infer import evaluate as ev
from ultrasound_modeling_tpu.infer import render


def test_composite_probability_formula(rng):
    p = rng.uniform(0, 1, size=(4, 8, 3)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    got = np.asarray(ev.composite_probability(jnp.asarray(p)))
    want = 1 - p[..., 0] - 0.5 * p[..., 1] + p[..., 2]
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # pure class-0 -> 0; pure brain -> 0.5; pure bleed -> 2
    pure = np.eye(3, dtype=np.float32)[None, :, :]
    vals = np.asarray(ev.composite_probability(jnp.asarray(pure)))[0]
    np.testing.assert_allclose(vals, [0.0, 0.5, 2.0], atol=1e-6)


def test_cascade_masks_outside_brain():
    # brain model: class0 prob 1 on the left half (outside), 0 on the right.
    def brain_forward(x):
        h = x.shape[1]
        left = (jnp.arange(x.shape[2]) < x.shape[2] // 2).astype(jnp.float32)
        p0 = jnp.broadcast_to(left[None, None, :], x.shape[:3])
        probs = jnp.stack([p0, 1 - p0, jnp.zeros_like(p0)], axis=-1)
        return probs

    def bleed_forward(x):
        # identity head: expose the (masked) input through the output
        return x[..., :3]

    cascade = ev.make_cascade(brain_forward, bleed_forward)
    x = jnp.ones((1, 4, 6, 5))
    seen = np.asarray(cascade(x))
    assert np.all(seen[:, :, :3, :] == 0.0)   # left (outside) zeroed
    assert np.all(seen[:, :, 3:, :] == 1.0)   # right untouched


def test_run_inference_pads_final_batch(rng):
    calls = []

    def forward(x):
        calls.append(x.shape[0])
        return jnp.ones(x.shape[:3] + (3,)) / 3

    x = rng.normal(size=(5, 8, 8, 2)).astype(np.float32)
    probs = ev.run_inference(forward, x, batch_size=2)
    assert probs.shape == (5, 8, 8, 3)
    assert all(c == 2 for c in calls)  # padded final chunk


def test_render_panels_writes_png(tmp_path, rng):
    comp = rng.uniform(0, 2, size=(32, 16)).astype(np.float32)
    truth = rng.uniform(0, 2, size=(32, 16)).astype(np.float32)
    bleed = rng.uniform(0, 1, size=(32, 16)).astype(np.float32)
    bmode = rng.normal(size=(32, 16)).astype(np.float32)
    out = render.render_panels(str(tmp_path / "p.png"), comp, truth,
                               prob_bleed=bleed, bmode=bmode)
    assert os.path.isfile(out)
    assert os.path.getsize(out) > 1000


def test_render_all_panel_types(tmp_path, rng):
    comp = rng.uniform(0, 2, size=(32, 16)).astype(np.float32)
    truth = rng.uniform(0, 2, size=(32, 16)).astype(np.float32)
    mask = (truth > 0.5).astype(np.float32)
    cm = rng.integers(0, 50, size=(3, 3))
    out = render.render_panels(str(tmp_path / "full.png"), comp, truth,
                               prob_bleed=comp / 2, bmode=truth, mask=mask,
                               diff=True, confusion=cm)
    assert os.path.isfile(out) and os.path.getsize(out) > 1000


def test_render_input_channels(tmp_path, rng):
    x = rng.normal(size=(16, 8, 3)).astype(np.float32)
    paths = render.render_input_channels(str(tmp_path / "in"), x)
    assert len(paths) == 3 and all(os.path.isfile(p) for p in paths)


def test_group_by_path():
    paths = np.array([["a"], ["a"], ["b"], ["c"], ["c"], ["c"]])
    groups = ev.group_by_path(paths)
    assert groups == [("a", 0, 2), ("b", 2, 3), ("c", 3, 6)]


def test_cardiac_inference_groups(rng):
    x = rng.normal(size=(5, 8, 8, 2)).astype(np.float32)
    paths = np.array(["s1", "s1", "s1", "s2", "s2"])

    def forward(b):
        return jnp.ones(b.shape[:3] + (3,)) / 3

    out = ev.cardiac_inference(forward, x, paths, batch_size=2)
    assert [(p, pr.shape[0]) for p, pr in out] == [("s1", 3), ("s2", 2)]


def test_default_axes_shapes():
    xa, ya = render.default_axes(32, 16)
    assert xa.shape == (33, 17) and ya.shape == (33, 17)


def test_render_panels_image_shaped_axes(tmp_path, rng):
    """The reference stores (256, 80) axes — SAME shape as the image
    (TBIEvaluator.py:19-24 + DataFilePlayGround.py:92-93) — which
    matplotlib >= 3.5 rejects under shading='flat'; shading='auto' must
    keep that geometry rendering."""
    from ultrasound_modeling_tpu.infer import render
    h, w = 64, 40
    xa = np.tile(np.arange(float(w)), (h, 1)).astype(int)
    ya = np.tile(np.arange(float(h))[:, None], (1, w)).astype(int)
    p = render.render_panels(
        str(tmp_path / "img_axes.png"),
        rng.uniform(0, 2, (h, w)), rng.uniform(0, 2, (h, w)),
        diff=True, axes=(xa, ya))
    assert os.path.getsize(p) > 0
