"""Augmentation golden tests against NumPy implementations of the *intended*
semantics (reference: DataAugs.py; divergences from its latent bugs are
documented in the augment module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrasound_modeling_tpu.data import augment

H, W, C = 32, 20, 4


def _np_shift(image, label, sr, sc):
    """out[i, j] = in[i + sr, j + sc], zero fill (intended DataAugs.py:6-23)."""
    out_im = np.zeros_like(image)
    out_lb = np.zeros_like(label)
    for i in range(H):
        for j in range(W):
            if 0 <= i + sr < H and 0 <= j + sc < W:
                out_im[i, j] = image[i + sr, j + sc]
                out_lb[i, j] = label[i + sr, j + sc]
    return out_im, out_lb


def test_shift_matches_naive(rng):
    image = rng.normal(size=(H, W, C)).astype(np.float32)
    label = rng.uniform(0, 2, size=(H, W)).astype(np.float32)
    # Run the jax shift with a fixed key, recover (sr, sc) from where the
    # origin pixel went, and compare against the naive loop.
    key = jax.random.PRNGKey(3)
    im2, lb2 = augment.shift(key, jnp.asarray(image), jnp.asarray(label))
    im2, lb2 = np.asarray(im2), np.asarray(lb2)
    # Derive the shift jax actually used by brute force.
    matched = False
    for direction in (1, -1):
        for dr in range(31):
            for dc in range(13):
                want_im, want_lb = _np_shift(image, label,
                                             direction * dr, direction * dc)
                if np.allclose(want_im, im2) and np.allclose(want_lb, lb2):
                    matched = True
                    break
            if matched:
                break
        if matched:
            break
    assert matched, "jax shift output does not correspond to any legal shift"


def test_cutout_zeroes_a_rectangle(rng):
    image = np.ones((256, 80, C), np.float32)
    label = np.ones((256, 80), np.float32)
    im2, lb2 = augment.cutout(jax.random.PRNGKey(0), jnp.asarray(image),
                              jnp.asarray(label))
    im2, lb2 = np.asarray(im2), np.asarray(lb2)
    zeroed = lb2 == 0
    n_zero = zeroed.sum()
    assert 0 < n_zero < 256 * 80
    # the zeroed region must be a rectangle
    rows = np.where(zeroed.any(axis=1))[0]
    cols = np.where(zeroed.any(axis=0))[0]
    assert np.all(zeroed[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1])
    # rectangle extents respect the reference's size bounds (<2*ra-1, <2*ca-1)
    assert len(rows) <= 2 * 40 - 1
    assert len(cols) <= 2 * 20 - 1
    # image zeroed exactly where label zeroed
    assert np.all(im2[zeroed] == 0)


def test_erode_shrinks_brain():
    label = np.zeros((H, W), np.float32)
    label[8:24, 5:15] = 1.0
    image = np.where(label[..., None] > 0, 1.0, 0.0).astype(np.float32)
    image = np.broadcast_to(image, (H, W, C)).copy()
    im2, lb2 = augment.erode_brain(jnp.asarray(image), jnp.asarray(label),
                                   jnp.asarray(2))
    lb2 = np.asarray(lb2)
    # 2 dilation iterations of the outside region shave 2 pixels per side.
    want = np.zeros((H, W), np.float32)
    want[10:22, 7:13] = 1.0
    np.testing.assert_array_equal(lb2, want)
    # all channels zeroed outside the eroded brain
    assert np.all(np.asarray(im2)[lb2 == 0] == 0)


def test_erode_zero_iters_is_identity():
    label = np.zeros((H, W), np.float32)
    label[8:24, 5:15] = 1.0
    image = np.broadcast_to(label[..., None], (H, W, C)).copy()
    im2, lb2 = augment.erode_brain(jnp.asarray(image), jnp.asarray(label),
                                   jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(lb2), label)


def test_noise_magnitude(rng):
    image = np.zeros((H, W, C), np.float32)
    noisy = np.asarray(augment.gaussian_noise(jax.random.PRNGKey(0),
                                              jnp.asarray(image)))
    assert 0 < np.abs(noisy).max() < 5e-3  # sigma = 1/5000
    assert abs(noisy.std() - 1 / 5000) < 1e-4


def test_contrast_stretch_range_and_mask(rng):
    img = rng.normal(size=(H, W, C)).astype(np.float32) * 3 + 1
    mask = np.zeros((H, W), np.float32)
    mask[4:28, 4:16] = 1.0
    out = np.asarray(augment.contrast_stretch(jnp.asarray(img),
                                              jnp.asarray(mask)))
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    assert np.all(out[mask < 0.1] == 0.0)


def test_rotate_small_identity_and_mass(rng):
    label = np.zeros((H, W), np.float32)
    label[10:20, 6:14] = 1.0
    image = np.broadcast_to(label[..., None], (H, W, C)).copy()
    # zero angle = identity
    im0, lb0 = augment.rotate_small(jnp.asarray(image), jnp.asarray(label),
                                    jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(lb0), label, atol=1e-6)
    # small angle roughly preserves mass
    im2, lb2 = augment.rotate_small(jnp.asarray(image), jnp.asarray(label),
                                    jnp.asarray(2.0))
    assert abs(float(np.asarray(lb2).sum()) - label.sum()) / label.sum() < 0.05
    assert not np.allclose(np.asarray(lb2), label)


def test_augment_batch_shapes_and_determinism(rng):
    images = rng.normal(size=(4, 256, 80, 10)).astype(np.float32)
    labels = rng.uniform(0, 2, size=(4, 256, 80)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    im1, lb1 = augment.augment_batch(key, jnp.asarray(images), jnp.asarray(labels))
    im2, lb2 = augment.augment_batch(key, jnp.asarray(images), jnp.asarray(labels))
    assert im1.shape == images.shape and lb1.shape == labels.shape
    np.testing.assert_array_equal(np.asarray(im1), np.asarray(im2))
    # different key -> different augmentation
    im3, _ = augment.augment_batch(jax.random.PRNGKey(8), jnp.asarray(images),
                                   jnp.asarray(labels))
    assert not np.allclose(np.asarray(im1), np.asarray(im3))
