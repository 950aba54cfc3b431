"""Native (C++) data-layer kernels vs NumPy oracles.

The native library is optional; these tests build it if g++ is available
and verify both the ctypes path and the NumPy fallback.
"""
import numpy as np
import pytest

from vlgp_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        native.build()
    return native.available()


def test_bin_spikes_matches_histogram():
    rng = np.random.default_rng(0)
    times = [np.sort(rng.uniform(0, 10, int(rng.integers(10, 300)))) for _ in range(16)]
    out = native.bin_spikes(times, 0.25)
    start = min(float(t.min()) for t in times)
    edges = start + np.arange(out.shape[1] + 1) * 0.25
    ref = np.stack([np.histogram(t, bins=edges)[0] for t in times])
    assert np.array_equal(out, ref)


def test_bin_spikes_window():
    out = native.bin_spikes([np.array([0.1, 0.2, 0.9])], 0.5, start=0.0, stop=1.0)
    assert out.shape == (1, 2)
    assert out[0].tolist() == [2.0, 1.0]


def test_pack_ragged():
    rng = np.random.default_rng(1)
    mats = [rng.normal(size=(L, 3)).astype(np.float32) for L in (5, 12, 8)]
    out, mask = native.pack_ragged(mats)
    assert out.shape == (3, 12, 3)
    for i, m in enumerate(mats):
        L = m.shape[0]
        assert np.allclose(out[i, :L], m)
        assert (out[i, L:] == 0).all()
        assert mask[i, :L].all() and not mask[i, L:].any()


def test_gather_segments_matches_numpy():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(4, 30, 2, 5)).astype(np.float32)
    idx = np.array([0, 3, 1], np.int32)
    start = np.array([0, 25, 10], np.int32)
    out = native.gather_segments(src, idx, start, 12)
    for k in range(3):
        i, s = int(idx[k]), int(start[k])
        L = min(12, 30 - s)
        assert np.allclose(out[k, :L], src[i, s : s + L])
        assert (out[k, L:] == 0).all()


def test_fallback_paths_agree():
    """NumPy fallback must produce identical results to the native path."""
    if not native.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(3)
    times = [np.sort(rng.uniform(0, 5, 50)) for _ in range(4)]
    fast = native.bin_spikes(times, 0.5)
    lib, native._lib = native._lib, None
    orig_exists = native._LIB_PATH

    class _NoPath:
        def exists(self):
            return False

    native._LIB_PATH = _NoPath()
    try:
        slow = native.bin_spikes(times, 0.5)
    finally:
        native._LIB_PATH = orig_exists
        native._lib = lib
    assert np.array_equal(fast, slow)
