"""label2vec parity: jnp implementation vs a NumPy re-derivation of the
reference thresholds (reference: Dataset_2.py:6-20)."""

import jax.numpy as jnp
import numpy as np

from ultrasound_modeling_tpu.data import labels


def _reference_label2vec_np(label, num_classes=3):
    """Literal NumPy transcription of the reference semantics."""
    if num_classes == 3:
        class_2 = np.where(label >= 1.05, label - 1, 0)
        class_2 = np.where(class_2 > 1, 1, class_2)
        class_1 = np.where(label > 0.95, 1 - class_2, 0)
        class_0 = np.where(label <= 0.95, 1, 0)
        return np.stack([class_0, class_1, class_2], axis=-1).astype(np.float32)
    class_1 = label
    class_0 = 1 - label
    return np.stack([class_0, class_1], axis=-1).astype(np.float32)


def test_label2vec_3class_matches_reference_semantics(rng):
    label = rng.uniform(-0.2, 2.3, size=(4, 16, 10)).astype(np.float32)
    got = np.asarray(labels.label2vec(jnp.asarray(label), 3))
    want = _reference_label2vec_np(label, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_label2vec_thresholds_exact():
    # Boundary cases around 0.95 / 1.05 and the >1 cap.
    label = np.array([[0.0, 0.95, 0.951, 1.0, 1.049, 1.05, 1.5, 2.0, 2.1]])
    got = np.asarray(labels.label2vec(jnp.asarray(label), 3))
    want = _reference_label2vec_np(label, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # label 2.1 -> class_2 capped at 1.
    assert got[0, -1, 2] == 1.0


def test_label2vec_2class(rng):
    label = rng.uniform(0, 1, size=(2, 8, 8)).astype(np.float32)
    got = np.asarray(labels.label2vec(jnp.asarray(label), 2))
    want = _reference_label2vec_np(label, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_one_hot_labels():
    label = np.array([[0, 1, 2, 2]])
    got = np.asarray(labels.one_hot_labels(jnp.asarray(label), 3))
    assert got.shape == (1, 4, 3)
    np.testing.assert_array_equal(got[0, 2], [0, 0, 1])


def test_vec2label_roundtrip():
    label = np.array([[0.0, 1.0, 2.0]])
    vec = labels.label2vec(jnp.asarray(label), 3)
    back = np.asarray(labels.vec2label(vec))
    np.testing.assert_array_equal(back, label)
