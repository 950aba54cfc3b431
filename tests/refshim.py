"""Import the reference implementation as a numerical oracle.

The reference pins old SciPy (`sym_pos=` removed in SciPy>=1.11) and old
scipy.ndimage module paths; this shim patches both *in our test process
only* so the untouched reference at /root/reference can serve as the oracle
for parity tests.  Returns None if the reference can't be loaded.
"""
import sys
import types


def load_reference():
    try:
        import scipy.linalg as sla

        if not getattr(sla.solve, "_vlgp_shim", False):
            _orig = sla.solve

            def solve(a, b, *args, **kw):
                if kw.pop("sym_pos", False):
                    kw["assume_a"] = "pos"
                return _orig(a, b, *args, **kw)

            solve._vlgp_shim = True
            sla.solve = solve

        # scipy.ndimage.filters was removed; alias it
        import scipy.ndimage as ndi

        if "scipy.ndimage.filters" not in sys.modules:
            mod = types.ModuleType("scipy.ndimage.filters")
            mod.gaussian_filter1d = ndi.gaussian_filter1d
            sys.modules["scipy.ndimage.filters"] = mod

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        import vlgp  # noqa: F401
        from vlgp import core, gp, preprocess  # noqa: F401

        return vlgp
    except Exception:
        return None
