"""Native .npy shard loader: C++ gather vs NumPy, bounds, fallback parity."""

import numpy as np
import pytest

from ultrasound_modeling_tpu.data.native_loader import NpyShard


@pytest.fixture
def shard_file(tmp_path, rng):
    arr = rng.normal(size=(32, 7, 5)).astype(np.float32)
    path = str(tmp_path / "shard.npy")
    np.save(path, arr)
    return path, arr


def test_native_gather_matches_numpy(shard_file, rng):
    path, arr = shard_file
    with NpyShard(path) as sh:
        assert sh.shape == arr.shape and sh.dtype == arr.dtype
        idx = rng.integers(0, 32, size=20)
        np.testing.assert_array_equal(sh.gather(idx), arr[idx])


def test_bounds_checked(shard_file):
    path, _ = shard_file
    with NpyShard(path) as sh:
        if not sh.native:
            pytest.skip("native lib unavailable")
        with pytest.raises(IndexError):
            sh.gather(np.array([32]))
        with pytest.raises(IndexError):
            sh.gather(np.array([-1]))


def test_fallback_parity(shard_file, rng):
    path, arr = shard_file
    idx = rng.integers(0, 32, size=11)
    with NpyShard(path) as native, \
            NpyShard(path, force_fallback=True) as fb:
        np.testing.assert_array_equal(native.gather(idx), fb.gather(idx))
        assert not fb.native


def test_float64_and_int(tmp_path):
    for dtype in (np.float64, np.int32, np.int64, np.uint8):
        arr = (np.arange(40).reshape(10, 4) % 7).astype(dtype)
        p = str(tmp_path / f"x_{np.dtype(dtype).name}.npy")
        np.save(p, arr)
        with NpyShard(p) as sh:
            np.testing.assert_array_equal(sh.gather(np.arange(10)), arr)


def test_dataset_out_of_core_matches_in_memory(tmp_path):
    """Dataset(out_of_core=True) produces identical batches to the
    in-memory loader, including the short-final-batch tail window."""
    import jax.numpy as jnp
    from ultrasound_modeling_tpu.data import synthetic
    from ultrasound_modeling_tpu.data.pipeline import Dataset

    tr = str(tmp_path / "train.npy")
    te = str(tmp_path / "test.npy")
    synthetic.write_npy(tr, 10, seed=0, height=32, width=16, n_disp=4)
    synthetic.write_npy(te, 5, seed=1, height=32, width=16, n_disp=4)

    d_mem = Dataset.from_npy(tr, te, 3)
    d_ooc = Dataset.from_npy(tr, te, 3, out_of_core=True)
    assert (d_ooc.height, d_ooc.width, d_ooc.channel) == (32, 16, 4)

    for _ in range(5):  # crosses the epoch boundary (10 samples, batch 4)
        xm, ym, tm = d_mem.next_train(4)
        xo, yo, to = d_ooc.next_train(4)
        assert tm == to
        np.testing.assert_array_equal(np.asarray(xo), np.asarray(xm))
        np.testing.assert_array_equal(np.asarray(yo), np.asarray(ym))
    xm, ym, _ = d_mem.next_test(3)
    xo, yo, _ = d_ooc.next_test(3)
    np.testing.assert_array_equal(np.asarray(xo), np.asarray(xm))
