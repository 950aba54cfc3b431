"""Data layer tests: packing, masking, segmentation, scatter-back."""
import numpy as np
import jax.numpy as jnp
import pytest

from vlgp_tpu.data import cut_trials, pack_trials, scatter_segments, unpack_trials


def _trials(lengths, ydim=4, seed=0):
    rng = np.random.default_rng(seed)
    return [{"y": rng.normal(size=(L, ydim))} for L in lengths]


def test_pack_ragged():
    data = pack_trials(_trials([30, 50, 20]), zdim=2)
    assert data.y.shape == (3, 50, 4)
    assert np.asarray(data.lengths).tolist() == [30, 50, 20]
    m = np.asarray(data.mask)
    assert m[0, :30].all() and not m[0, 30:].any()
    assert m[1].all()


def test_pack_respects_user_fields():
    t = _trials([10])
    t[0]["mu"] = np.ones((10, 2))
    t[0]["x"] = np.full((10, 1, 4), 2.0)
    data = pack_trials(t, zdim=2)
    assert np.allclose(np.asarray(data.mu[0, :10]), 1.0)
    assert np.allclose(np.asarray(data.x[0, :10]), 2.0)


def test_cut_trials_covers_everything():
    data = pack_trials(_trials([120, 95, 50]), zdim=2)
    seg = cut_trials(data, 50, seed=0)
    # ceil(120/50)+ceil(95/50)+1 = 3+2+1
    assert seg.ntrial == 6
    assert seg.nbin == 50
    # every valid bin of every trial is covered by at least one segment
    for i, L in enumerate([120, 95, 50]):
        covered = np.zeros(L, bool)
        for k in range(seg.ntrial):
            if int(seg.trial_idx[k]) == i:
                s = int(seg.start[k])
                covered[s : min(s + 50, L)] = True
        assert covered.all(), i
    # segment content matches the parent trial
    y = np.asarray(data.y)
    for k in range(seg.ntrial):
        i, s = int(seg.trial_idx[k]), int(seg.start[k])
        L = min(50, int(data.lengths[i]) - s)
        assert np.array_equal(np.asarray(seg.y[k, :L]), y[i, s : s + L])


def test_cut_trials_deterministic():
    data = pack_trials(_trials([123]), zdim=2)
    s1 = cut_trials(data, 50, seed=7)
    s2 = cut_trials(data, 50, seed=7)
    assert np.array_equal(np.asarray(s1.start), np.asarray(s2.start))


def test_cut_trials_short_trial_masked():
    data = pack_trials(_trials([30]), zdim=2)
    seg = cut_trials(data, 50, seed=0)
    assert seg.ntrial == 1
    m = np.asarray(seg.mask[0])
    assert m[:30].all() and not m[30:].any()


def test_cut_none_returns_data():
    data = pack_trials(_trials([30]), zdim=2)
    assert cut_trials(data, None) is data


def test_scatter_segments_roundtrip():
    data = pack_trials(_trials([120, 95]), zdim=2)
    seg = cut_trials(data, 50, seed=0)
    marked = seg.replace(mu=jnp.ones_like(seg.mu) * 3.0)
    back = scatter_segments(data, marked)
    mu = np.asarray(back.mu)
    for i, L in enumerate([120, 95]):
        assert np.allclose(mu[i, :L], 3.0)


def test_unpack_trims_padding():
    trials = _trials([30, 50])
    data = pack_trials(trials, zdim=2)
    out = unpack_trials(data, trials)
    assert out[0]["y"].shape == (30, 4)
    assert out[0]["mu"].shape == (30, 2)
    assert out[1]["y"].shape == (50, 4)
