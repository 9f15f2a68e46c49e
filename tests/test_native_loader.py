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
