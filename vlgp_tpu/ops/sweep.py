"""Fused E-step sweep: ALL Newton sweeps of the E-step in one Pallas kernel.

The E-step (``models/vlgp.py:estep``, reference core.py:22-126) iterates
Eniter Newton sweeps per segment; each sweep rebuilds the linear predictor,
the working residual, the Woodbury inverse X = (I + G'WG)^{-1}, the
posterior-mean update, and the VB marginal variance.  The computation is
*independent per segment* (the reference's per-trial loop), so the entire
sweep chain for a block of segments fits in VMEM — and that kills the
step's dominant HBM traffic: the (Z, S, R, R) inverse (~64 MB at the
flagship config) that the unfused path round-trips to HBM once per sweep
(probe read + cond pass-through + delta einsum read — TRACE.md measures
~30% of device time in that while/cond scaffolding).

Kernel layout, per grid block of ``bs`` segments (all Z latents inside):

  carry (VMEM values across sweeps): mu, w, v, dmu (Z, bs, T) and the
  PACKED Woodbury inverses (tiles, 128, 128) — gpt = 128 // R matrices per
  MXU tile, exactly the packing of ``ops/spd.py:_ns_packed_pallas`` (products
  of block-diagonal matrices stay block-diagonal, so NS on the packed form
  is exact).  Per sweep:

    eta  = sum_z mu_z (x) a_z + xb            (VPU broadcast-MACs)
    r    = trunc_exp(eta + 0.5 sum_z v_z (x) a_z^2)
    s_z  = sum_y resid * a_z                  (working residual projection)
    delta= u - G X G'(w u), u = G G's - mu    (low-rank Woodbury, core.py:85-97)
    w_z  = sum_y U * a_z^2                    (precision weights, core.py:104)
    A_z  = G' diag(w) G  -> pack -> Newton-Schulz refine from the previous
           sweep's X (bf16x3 matmuls, residual-checked, in-kernel
           escalation), v = diag(G X G')      (VB only)

  HBM traffic per E-step: y/xb read once, posterior tensors once, the
  carried inverse once in and once out — independent of the sweep count.

Numerics: the small contractions run f32 on the VPU (the unfused XLA path
runs them as default-precision bf16 matmuls, so this path is slightly
*more* accurate); the NS matmuls are bf16x3 exactly as in ops/spd.py, with
the same 1e-2 residual contract.  Every block's worst post-escalation
residual is emitted; the XLA wrapper falls back to the unfused E-step
(which ends in an exact-Cholesky net) if any block failed — the kernel
never silently returns an unconverged inverse (ADVICE-r1 contract).

The adaptive sweep exit (config.estep_tol) runs PER BLOCK on block-local
norms: each segment block stops sweeping when its own Newton updates stall
(|dmu| <= tol |mu|, at least 2 sweeps), instead of the unfused path's
global-norm exit — a finer-grained version of the same criterion (blocks
that converge early stop paying for the stragglers).  Trip counts therefore
differ from the unfused path; quality gates (tools/head2head.py,
tools/indep_draw.py) pin the outcome.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:  # pragma: no cover - exercised via interpret mode on CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .spd import _RESID_TOL

__all__ = ["estep_sweep_fused", "sweep_fused_eligible"]

# exp clip bound — must match ops/math.py:trunc_exp
_EXP_BOUND = 10.0


def _make_sweep_kernel(*, Z: int, T: int, Y: int, R: int, bs: int,
                       niter: int, tol: float, dmu_bound: float,
                       ns_iters: int, ns_warm_iters: int, vb: bool,
                       has_x: bool):
    """Build the fused-sweep kernel body (all shapes/trip counts static)."""
    gpt = max(1, 128 // R)
    tiles = -(-(Z * bs) // gpt)
    n = Z * bs  # matrices to invert per block

    def body(y_ref, xb_ref, mask_ref, a_ref, a2_ref, pois_ref, invn_ref,
             g_ref, mu_ref, w_ref, v_ref, x0_ref,
             mu_o, w_o, v_o, dmu_o, x_o, resid_o, mp_ref, xp_ref):
        f32 = jnp.float32
        y = y_ref[:]            # (bs, T, Y)
        xb = xb_ref[:]          # (bs, T, Y)
        mask = mask_ref[:]      # (bs, T)
        a = a_ref[:]            # (ZP, Y); rows >= Z are zero padding
        a2 = a2_ref[:]          # (ZP, Y) = 0.5 * a * a
        pois = pois_ref[:][0][None, None, :]  # (1, 1, Y) float 0/1
        invn = invn_ref[:][0][None, None, :]  # (1, 1, Y) 1/max(noise, tiny)
        eyeR = jnp.eye(R, dtype=f32)
        eyeP = jnp.eye(128, dtype=f32)

        # ---- bf16x3 batched matmul (= XLA Precision.HIGH), ops/spd.py ----
        def _split(x):
            hi = x.astype(jnp.bfloat16)
            return hi, (x - hi.astype(f32)).astype(jnp.bfloat16)

        def _dot(P, Q, dims):
            return lax.dot_general(P, Q, dimension_numbers=dims,
                                   preferred_element_type=f32)

        def mm(P, Q, dims=(((2,), (1,)), ((0,), (0,)))):
            ph, plo = _split(P)
            qh, qlo = _split(Q)
            return _dot(ph, qh, dims) + (_dot(ph, qlo, dims)
                                         + _dot(plo, qh, dims))

        # per-latent prior factors, VMEM-resident for the whole block
        G = [g_ref[z] for z in range(Z)]  # each (T, R)
        Gb = [jnp.broadcast_to(G[z][None], (bs, T, R)) for z in range(Z)]

        # ---- packing helpers (ops/spd.py:_ns_packed_pallas layout) ----
        rvec = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cvec = lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        blockmask = ((rvec // R) == (cvec // R)) & (rvec < gpt * R)

        def pack(mats, out_ref):
            # mats: (n, R, R) -> block-diagonal (tiles, 128, 128); invalid
            # tail slots get I (NS fixed point = I, zero residual)
            out_ref[:] = jnp.zeros((tiles, 128, 128), f32)
            padded = jnp.concatenate(
                [mats] + ([jnp.broadcast_to(eyeR[None],
                                            (tiles * gpt - n, R, R))]
                          if tiles * gpt > n else []),
                axis=0,
            ).reshape(tiles, gpt, R, R)
            for g in range(gpt):
                lo = g * R
                out_ref[:, lo:lo + R, lo:lo + R] = padded[:, g]

        def unpack(Xp):
            Xr = jnp.stack(
                [Xp[:, g * R:g * R + R, g * R:g * R + R]
                 for g in range(gpt)], axis=1,
            ).reshape(tiles * gpt, R, R)
            return Xr[:n]

        def block_resid(MX):
            return jnp.max(
                jnp.where(blockmask[None], jnp.abs(MX - eyeP[None]), 0.0)
            )

        def cold_init():
            # per-tile scaled-identity NS start c = 2/(1 + rowsum bound),
            # with the diagonal masked to the valid block region: writing c
            # on the DEAD lanes (rows >= gpt*R, where M is zero) would make
            # NS double them every iteration — ~200 doublings per E-step
            # overflows f32 and the resulting 0*inf = NaN contaminates the
            # whole iterate (the round-3 scaffold's on-device failure mode)
            Mp = mp_ref[:]
            masked = jnp.where(blockmask[None], jnp.abs(Mp), 0.0)
            lhat = jnp.max(jnp.sum(masked, axis=-1), axis=-1)  # (tiles,)
            diag = (rvec == cvec) & (rvec < gpt * R)
            return jnp.where(diag[None],
                             (2.0 / (1.0 + lhat))[:, None, None], 0.0)

        def ns(_, X):
            MX = mm(mp_ref[:], X)
            return mm(X, 2.0 * eyeP[None] - MX)

        def _refine(X, first_iters):
            """first_iters NS rounds + escalation net (ops/spd.py:_ns_auto):
            two more full rounds cover condition numbers to ~1e9."""
            X = lax.fori_loop(0, first_iters, ns, X)
            resid = block_resid(mm(mp_ref[:], X))

            def esc(carry):
                X, resid, k = carry
                X = lax.fori_loop(0, ns_iters, ns, X)
                return X, block_resid(mm(mp_ref[:], X)), k + 1

            def esc_cond(carry):
                _, resid, k = carry
                return jnp.logical_not(resid < _RESID_TOL) & (k < 2)

            X, resid, _ = lax.while_loop(
                esc_cond, esc, (X, resid, jnp.int32(0))
            )
            return X, resid

        def ns_refine(first_iters, was_warm=True):
            """NS-refine xp_ref against mp_ref in place; returns the final
            residual.  A warm start that refinement cannot rescue — zeros
            (a NS fixed point: the driver's first-iteration carry), garbage,
            or a NaN-corrupted iterate — is restarted cold in-kernel, the
            same net ops/spd.py:_ns_auto provides at the XLA level; only a
            genuinely ill-conditioned M reaches the whole-E-step fallback.
            ``was_warm=False`` (the initial no-carry call, which already
            starts from cold_init) skips the restart: re-running the
            identical cold refine could not produce a different result
            (ADVICE-r4)."""
            X, resid = _refine(xp_ref[:], first_iters)
            if was_warm:
                X, resid = lax.cond(
                    resid < _RESID_TOL,
                    lambda: (X, resid),
                    lambda: _refine(cold_init(), ns_iters),
                )
            xp_ref[:] = X
            return resid

        # ---- shared per-sweep pieces ----
        def predictor(mu, v):
            # eta, rate from latent-major posterior: Z broadcast-MACs (VPU)
            eta = xb
            arg = jnp.zeros((bs, T, Y), f32)
            for z in range(Z):
                eta = eta + mu[z][:, :, None] * a[z][None, None, :]
                arg = arg + v[z][:, :, None] * a2[z][None, None, :]
            r = jnp.exp(jnp.minimum(eta + arg, _EXP_BOUND))
            return eta, r

        def weights(r):
            U = pois * r + (1.0 - pois) * invn
            return [
                jnp.sum(U * (2.0 * a2[z])[None, None, :], axis=2) * mask
                for z in range(Z)
            ]

        def gram(w):
            # A_z = G_z' diag(w_z) G_z per segment, then pack with I + A
            mats = []
            for z in range(Z):
                Gw = w[z][:, :, None] * Gb[z]  # (bs, T, R)
                A = mm(Gw, G[z], (((1,), (0,)), ((), ())))  # (bs, R, R)
                mats.append(A + eyeR[None])
            pack(jnp.concatenate(mats, axis=0), mp_ref)

        def marginal_v(Xs):
            # v_z = diag(G X G'), masked; Xs: list of (bs, R, R)
            out = []
            for z in range(Z):
                GX = mm(Gb[z], Xs[z])  # (bs, T, R)
                out.append(jnp.sum(GX * Gb[z], axis=-1) * mask)
            return out

        # ---- initial state ----
        mu = [mu_ref[z] for z in range(Z)]
        w = [w_ref[z] * mask for z in range(Z)]
        v = [v_ref[z] for z in range(Z)]
        dmu = [jnp.zeros((bs, T), f32) for _ in range(Z)]

        # X0 = (I + G'W0G)^{-1}, warm-started from the carried inverse
        gram(w)
        if has_x:
            pack(jnp.concatenate([x0_ref[z] for z in range(Z)], axis=0),
                 xp_ref)
            first = ns_warm_iters
        else:
            xp_ref[:] = cold_init()
            first = ns_iters
        worst = ns_refine(first, was_warm=has_x)

        def sweep(state):
            mu, w, v, dmu, worst, i, nd, nm = state
            Xs_flat = unpack(xp_ref[:])
            Xs = [Xs_flat[z * bs:(z + 1) * bs] for z in range(Z)]
            eta, r = predictor(mu, v)
            resid = pois * (y - r) + (1.0 - pois) * (y - eta) * invn
            resid = resid * mask[:, :, None]
            mu_n, dmu_n = [], []
            for z in range(Z):
                s = jnp.sum(resid * a[z][None, None, :], axis=2)  # (bs, T)
                Gts = mm(s, G[z], (((1,), (0,)), ((), ())))  # (bs, R)
                u = mm(Gts, G[z], (((1,), (1,)), ((), ()))) - mu[z]  # (bs,T)
                Gwu = mm(w[z] * u, G[z], (((1,), (0,)), ((), ())))  # (bs,R)
                M = mm(Xs[z], Gwu[:, :, None])[..., 0]  # (bs, R)
                delta = u - mm(M, G[z], (((1,), (1,)), ((), ())))
                delta = jnp.clip(delta, -dmu_bound, dmu_bound) * mask
                mu_n.append(mu[z] + delta)
                dmu_n.append(delta)
            # refresh weights + inverse (+ v) under the updated posterior
            _, r = predictor(mu_n, v)
            w_n = weights(r)
            gram(w_n)
            resid_ns = ns_refine(ns_warm_iters)
            worst = jnp.maximum(worst, resid_ns)
            if vb:
                Xs_flat = unpack(xp_ref[:])
                Xs = [Xs_flat[z * bs:(z + 1) * bs] for z in range(Z)]
                v_n = marginal_v(Xs)
            else:
                v_n = v
            nd = sum(jnp.sum(d * d) for d in dmu_n)
            nm = sum(jnp.sum(m * m) for m in mu_n)
            return mu_n, w_n, v_n, dmu_n, worst, i + 1, nd, nm

        one = jnp.float32(1.0)
        state = (mu, w, v, dmu, worst, jnp.int32(0), one, one)
        if tol <= 0:
            state = lax.while_loop(
                lambda s: s[5] < niter, sweep, state
            )
        else:
            # per-block adaptive exit: stop when this block's Newton
            # updates stall (>= 2 sweeps always run, as in the unfused path)
            def cont(s):
                i, nd, nm = s[5], s[6], s[7]
                return (i < niter) & ((i < 2) | (nd > tol * tol * nm))

            state = lax.while_loop(cont, sweep, state)
        mu, w, v, dmu, worst = state[0], state[1], state[2], state[3], state[4]

        mu_o[:] = jnp.stack(mu)
        w_o[:] = jnp.stack(w)
        v_o[:] = jnp.stack(v)
        dmu_o[:] = jnp.stack(dmu)
        Xs_flat = unpack(xp_ref[:])
        x_o[:] = Xs_flat.reshape(Z, bs, R, R)
        r3 = lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        c3 = lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        resid_o[:] = jnp.where((r3 == 0) & (c3 == 0), worst, 0.0)

    return body


def _sweep_vmem_bytes(Z, T, Y, R, bs) -> int:
    """Rough VMEM footprint estimate for the block geometry (operands +
    carries + NS tiles + matmul temporaries), used by the eligibility
    gate and the block-size picker."""
    gpt = max(1, 128 // R)
    tiles = -(-(Z * bs) // gpt)
    big = 4 * bs * T * Y          # y / xb / eta / r / resid ...
    per = (
        4 * big                   # y, xb + ~2 live (bs,T,Y) temporaries
        + 10 * 4 * Z * bs * T     # mu/w/v/dmu + sweep temporaries
        + 3 * 4 * Z * bs * R * R  # x0 in, x out, unpacked X
        + 2 * 4 * tiles * 128 * 128  # mp/xp scratch
        + 2 * 4 * tiles * 128 * 128  # matmul pipeline headroom
    )
    return per


def _pick_bs(Z, T, Y, R, budget: int = 11 * 2**20) -> int:
    """Largest block size (multiple of gpt when possible, >= 4) that fits
    the VMEM budget; 0 if nothing fits."""
    # multiples of 8: bs is the sublane dim of the (Z, bs, T) blocks
    for bs in (64, 48, 32, 24, 16, 8):
        if _sweep_vmem_bytes(Z, T, Y, R, bs) <= budget:
            return bs
    return 0


def sweep_fused_eligible(data, params, G, dist) -> bool:
    """Static eligibility: f32, Pallas available, no model-axis sharding
    (the sweep body would need in-kernel psums), R <= 128, fits VMEM."""
    Z, T, R = G.shape
    Y = data.y.shape[-1]
    return (
        _HAS_PALLAS
        and dist.model is None
        and G.dtype == jnp.float32
        and data.y.dtype == jnp.float32
        and R <= 128
        and _pick_bs(Z, T, Y, R) > 0
    )


@functools.partial(
    jax.jit,
    static_argnames=("niter", "tol", "dmu_bound", "ns_iters",
                     "ns_warm_iters", "vb", "interpret"),
)
def _sweep_pallas(y, xb, mask, a, noise, poisson, G, muz, wz, vz, xinv,
                  *, niter: int, tol: float, dmu_bound: float,
                  ns_iters: int, ns_warm_iters: int, vb: bool,
                  interpret: bool = False):
    """Dispatch the fused-sweep kernel over segment blocks.

    y/xb: (S, T, Y); mask: (S, T); a: (Z, Y); G: (Z, T, R);
    muz/wz/vz: (Z, S, T); xinv: (Z, S, R, R) or None.
    Returns (muz, wz, vz, dmuz, X, max_residual).
    """
    S, T, Y = y.shape
    Z, _, R = G.shape
    bs = _pick_bs(Z, T, Y, R)
    SP = -(-S // bs) * bs
    pad = SP - S
    if pad:
        # zero-padded segments are exactly inert (mask 0 -> w 0 -> A 0 ->
        # X = I is the NS fixed point; delta 0)
        pad3 = lambda x: jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        y, xb = pad3(y), pad3(xb)
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        padz = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        muz, wz, vz = padz(muz), padz(wz), padz(vz)
        if xinv is not None:
            xinv = jnp.pad(xinv, ((0, 0), (0, pad), (0, 0), (0, 0)))

    nblk = SP // bs
    gpt = max(1, 128 // R)
    tiles = -(-(Z * bs) // gpt)
    f32 = jnp.float32
    # pad the tiny per-latent/per-channel operands' sublane dim to 8
    # (Mosaic block constraint); the kernel statically indexes rows < Z
    ZP = -(-Z // 8) * 8
    a = jnp.pad(a.astype(f32), ((0, ZP - Z), (0, 0)))
    a2 = 0.5 * a * a
    pois = jnp.broadcast_to(poisson.astype(f32).reshape(1, Y), (8, Y))
    invn = jnp.broadcast_to(
        (1.0 / jnp.maximum(noise, 1e-30)).astype(f32).reshape(1, Y), (8, Y)
    )

    kernel = _make_sweep_kernel(
        Z=Z, T=T, Y=Y, R=R, bs=bs, niter=niter, tol=tol,
        dmu_bound=dmu_bound, ns_iters=ns_iters,
        ns_warm_iters=ns_warm_iters, vb=vb, has_x=xinv is not None,
    )

    sty = pl.BlockSpec((bs, T, Y), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    st = pl.BlockSpec((bs, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    zy = pl.BlockSpec((ZP, Y), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oy = pl.BlockSpec((8, Y), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ztr = pl.BlockSpec((Z, T, R), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    zst = pl.BlockSpec((Z, bs, T), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    zsrr = pl.BlockSpec((Z, bs, R, R), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    resid_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    in_specs = [sty, sty, st, zy, zy, oy, oy, ztr, zst, zst, zst]
    args = [y, xb, mask, a, a2, pois, invn, G, muz, wz, vz]
    if xinv is not None:
        in_specs.append(zsrr)
        args.append(xinv.astype(f32))

    out_shape = (
        jax.ShapeDtypeStruct((Z, SP, T), f32),  # mu
        jax.ShapeDtypeStruct((Z, SP, T), f32),  # w
        jax.ShapeDtypeStruct((Z, SP, T), f32),  # v
        jax.ShapeDtypeStruct((Z, SP, T), f32),  # dmu
        jax.ShapeDtypeStruct((Z, SP, R, R), f32),  # X
        jax.ShapeDtypeStruct((nblk, 8, 128), f32),  # residual
    )
    out_specs = (zst, zst, zst, zst, zsrr, resid_spec)

    def body(*refs):
        if xinv is None:
            # splice a None x0_ref into the kernel signature
            (y_r, xb_r, m_r, a_r, a2_r, p_r, n_r, g_r, mu_r, w_r, v_r,
             mu_o, w_o, v_o, dmu_o, x_o, res_o, mp, xp) = refs
            return kernel(y_r, xb_r, m_r, a_r, a2_r, p_r, n_r, g_r,
                          mu_r, w_r, v_r, None,
                          mu_o, w_o, v_o, dmu_o, x_o, res_o, mp, xp)
        return kernel(*refs)

    kwargs = {}
    if not interpret:
        # the sweep chain's live temporaries exceed Mosaic's default 16 MB
        # scoped-VMEM stack; v5e/v4 cores have 128 MB of VMEM, so raise the
        # limit instead of shrinking the block (measured 25.2 MB at bs=16,
        # flagship shapes).  64 MB leaves headroom for double-buffered
        # input DMA windows.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        )
    outs = pl.pallas_call(
        body,
        out_shape=out_shape,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tiles, 128, 128), f32),
            pltpu.VMEM((tiles, 128, 128), f32),
        ],
        interpret=interpret,
        **kwargs,
    )(*args)

    mu, w, v, dmu, X, resid = outs
    resid = jnp.max(resid[:, 0, 0])
    if pad:
        mu, w, v, dmu = (t[:, :S] for t in (mu, w, v, dmu))
        X = X[:, :S]
    return mu, w, v, dmu, X, resid


def estep_sweep_fused(y, xb, mask, a, noise, poisson, G, muz, wz, vz, xinv,
                      *, niter, tol, dmu_bound, ns_iters, ns_warm_iters,
                      vb, fallback, interpret: bool = False):
    """Run the fused-sweep kernel; fall back to ``fallback()`` (the unfused
    E-step core, ending in an exact-Cholesky net) if any block's inverse
    failed its residual check — the kernel never silently returns an
    unconverged inverse.

    ``fallback`` must return the same (muz, wz, vz, dmuz, X) tuple.
    """
    mu, w, v, dmu, X, resid = _sweep_pallas(
        y, xb, mask, a, noise, poisson, G, muz, wz, vz, xinv,
        niter=niter, tol=tol, dmu_bound=dmu_bound, ns_iters=ns_iters,
        ns_warm_iters=ns_warm_iters, vb=vb, interpret=interpret,
    )
    ok = jnp.isfinite(resid) & (resid < _RESID_TOL)
    return lax.cond(ok, lambda: (mu, w, v, dmu, X), fallback)
