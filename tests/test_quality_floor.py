"""In-suite self-tuned quality floor vs the reference (VERDICT-r3 weak #6).

Fits the reference's own tutorial workload (the same seeded Lorenz ->
Poisson draw tools/head2head.py scores, simulated by the REFERENCE
simulator via refshim) self-tuned at the shipped defaults and pins the
lstsq-aligned recovery R^2 at or above the reference's measured result
(HEAD2HEAD_REF.json: 0.9212, reference core fit at max_iter=20/min_iter=10).

This is the in-suite version of the tools/head2head.py gate: previously a
change could silently degrade the self-tuned trajectory (the H-step omega
basin is sensitive — STATUS.md round-3 second half) while every unit and
parity test stayed green, because the only full-trajectory coupling to the
reference lived in tools/.  Skipped when the reference checkout is absent.
"""
import json
import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _ref_r2() -> float:
    cache = ROOT / "HEAD2HEAD_REF.json"
    if not cache.exists():
        pytest.skip("HEAD2HEAD_REF.json missing (run tools/head2head.py --ref)")
    return float(json.loads(cache.read_text())["ref_r2"])


@pytest.mark.slow
def test_self_tuned_r2_beats_reference():
    import sys

    sys.path.insert(0, str(ROOT / "tools"))
    import head2head as h2h

    try:
        y, x = h2h.simulate()
    except (ImportError, AssertionError):
        pytest.skip("reference simulator unavailable")
    ref_r2 = _ref_r2()
    r2, res = h2h.fit_ours(y, x)
    assert np.isfinite(r2)
    # the floor is the reference's own self-tuned score on this exact draw;
    # shipped rounds measured 0.9247-0.9259 here (STATUS.md), so a pass has
    # ~0.004 of headroom — tight enough to catch a basin regression, loose
    # enough to absorb kernel-level float noise (~0.002 band)
    assert r2 >= ref_r2, (
        f"self-tuned R^2 {r2:.4f} fell below the reference's {ref_r2:.4f}"
    )
