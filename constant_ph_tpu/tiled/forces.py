"""Tiled pair blocks: water-water (roll half-stencil), water-solute,
solute-solute. Zero gathers per step — every operand is a roll, reshape,
broadcast, or reduction (see tiled/__init__.py for the measured rationale).

Per-atom energy tallies (the reference's eatom contract,
fix_constant_pH.cpp:216-219) and φ = ∂U/∂q come out of the same pass.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units
from constant_ph_tpu.ops.kernels import (
    R2_MIN,
    TWO_OVER_SQRT_PI,
    coul_kernel,
    lj_kernel,
)
from constant_ph_tpu.state import min_image
from constant_ph_tpu.tiled.layout import (
    SoluteTables,
    TileParams,
    WaterModel,
    pair_chunk_plan,
)


@struct.dataclass
class BlockSums:
    e_lj: jax.Array
    e_coul: jax.Array
    fi: tuple          # 3 arrays (..., A)
    fj: tuple          # 3 arrays (..., B) (None-like zeros if single-sided)
    eatom_i: jax.Array
    eatom_j: jax.Array
    phi_i: jax.Array
    phi_j: jax.Array


def _pair_block(xi, xj, box, qi, qj, c6p, c12p, eshp, scoulp, weight,
                *, style, alpha, rc, double_sided):
    """Generic dense pair block between atom sets A and B.

    xi/xj: tuples of 3 per-dim coordinate arrays (..., A) / (..., B).
    All coefficient args broadcastable to (..., A, B). weight ∈ {0,1}
    encodes validity + exclusions; masked pairs are pushed outside the
    cutoff (NaN-safe double-where).
    """
    far = rc * rc + 1.0
    dx = []
    r2 = None
    for d in range(3):
        dxd = min_image(xi[d][..., :, None] - xj[d][..., None, :], box[d])
        dx.append(dxd)
        r2 = dxd * dxd if r2 is None else r2 + dxd * dxd
    r2 = jnp.where(weight > 0, jnp.maximum(r2, R2_MIN), far)
    in_rc = (r2 < rc * rc).astype(r2.dtype)
    inv_r2 = 1.0 / r2
    r = jnp.sqrt(r2)

    e_lj_p, f_lj = lj_kernel(inv_r2, c6p, c12p, eshp)
    e_lj_p = e_lj_p * in_rc
    f_lj = f_lj * in_rc

    u_r, w_r = coul_kernel(r2, r, inv_r2, scoulp, alpha=alpha, style=style,
                           rc=rc)
    u_r = u_r * in_rc
    w_r = w_r * in_rc
    kqq = units.QQR2E * qi[..., :, None] * qj[..., None, :]
    e_c_p = kqq * u_r
    f_c = kqq * w_r

    fpair = f_lj + f_c
    fi = tuple(jnp.sum(fpair * dx[d], axis=-1) for d in range(3))
    e_p = e_lj_p + e_c_p
    eatom_i = 0.5 * jnp.sum(e_p, axis=-1)
    phi_i = units.QQR2E * jnp.sum(qj[..., None, :] * u_r, axis=-1)
    if double_sided:
        fj = tuple(-jnp.sum(fpair * dx[d], axis=-2) for d in range(3))
        eatom_j = 0.5 * jnp.sum(e_p, axis=-2)
        phi_j = units.QQR2E * jnp.sum(qi[..., :, None] * u_r, axis=-2)
        scale = 1.0
    else:
        fj = eatom_j = phi_j = None
        scale = 0.5  # full matrix counted once from the i side
    return BlockSums(
        e_lj=scale * jnp.sum(e_lj_p),
        e_coul=scale * jnp.sum(e_c_p),
        fi=fi, fj=fj, eatom_i=eatom_i, eatom_j=eatom_j,
        phi_i=phi_i, phi_j=phi_j,
    )


def _water_patterns(wm: WaterModel, W: int, dtype):
    q_pat = jnp.asarray(np.tile(wm.q_pattern, W), dtype=dtype)       # (3W,)
    lj_pat = jnp.asarray(np.tile([1.0, 0.0, 0.0], W), dtype=dtype)   # O only
    a = np.arange(3 * W)
    same_mol = (a[:, None] // 3) == (a[None, :] // 3)
    return q_pat, lj_pat, jnp.asarray(~same_mol, dtype=dtype)


def water_water(wxg, wvalid, wm: WaterModel, p: TileParams, box,
                *, style, alpha, rc):
    """All water-water interactions. wxg: (3, gx, gy, gz, 3W);
    wvalid: (gx, gy, gz, W). Returns (e_lj, e_coul, f (3,...,3W),
    eatom (...,3W), phi (...,3W))."""
    gx, gy, gz = p.grid
    W = p.W
    dtype = wxg.dtype
    q_pat, lj_pat, not_same_mol = _water_patterns(wm, W, dtype)
    vmask = jnp.repeat(wvalid, 3, axis=-1)                # (gx,gy,gz,3W)

    xi = tuple(wxg[d] for d in range(3))
    qi = q_pat[None, None, None, :]
    c6_ij = wm.c6_OO * lj_pat[:, None] * lj_pat[None, :]
    c12_ij = wm.c12_OO * lj_pat[:, None] * lj_pat[None, :]
    esh_ij = wm.eshift_OO * lj_pat[:, None] * lj_pat[None, :]

    f = [jnp.zeros_like(wxg[d]) for d in range(3)]
    eatom = jnp.zeros_like(vmask)
    phi = jnp.zeros_like(vmask)
    e_lj = jnp.zeros((), dtype)
    e_coul = jnp.zeros((), dtype)

    # self cell: full matrix, same-molecule pairs excluded, i-side counting
    w_self = (vmask[..., :, None] * vmask[..., None, :]) * not_same_mol
    bs = _pair_block(xi, xi, box, qi, qi, c6_ij, c12_ij, esh_ij, 1.0,
                     w_self, style=style, alpha=alpha, rc=rc,
                     double_sided=False)
    for d in range(3):
        f[d] = f[d] + bs.fi[d]
    # full matrix: row-sums already give each atom its half-share of every
    # pair, and the 0.5 energy scale in the block de-duplicates (i,j)/(j,i)
    eatom = eatom + bs.eatom_i
    phi = phi + bs.phi_i
    e_lj = e_lj + bs.e_lj
    e_coul = e_coul + bs.e_coul

    # half stencil: each unordered cell pair once, both sides accumulated
    axes = (1, 2, 3)
    vaxes = (0, 1, 2)
    for off in p.half_stencil:
        sh = tuple(-o for o in off)
        xj = tuple(jnp.roll(wxg[d], sh, axis=vaxes) for d in range(3))
        vmj = jnp.roll(vmask, sh, axis=vaxes)
        w = vmask[..., :, None] * vmj[..., None, :]
        bs = _pair_block(xi, xj, box, qi, qi, c6_ij, c12_ij, esh_ij, 1.0,
                         w, style=style, alpha=alpha, rc=rc,
                         double_sided=True)
        for d in range(3):
            f[d] = f[d] + bs.fi[d] + jnp.roll(bs.fj[d], off, axis=vaxes)
        eatom = eatom + bs.eatom_i + jnp.roll(bs.eatom_j, off, axis=vaxes)
        phi = phi + bs.phi_i + jnp.roll(bs.phi_j, off, axis=vaxes)
        e_lj = e_lj + bs.e_lj
        e_coul = e_coul + bs.e_coul
    return e_lj, e_coul, f, eatom, phi


def water_solute(wxg, wvalid, sx, qs, st: SoluteTables, wm: WaterModel,
                 p: TileParams, box, *, style, alpha, rc):
    """Water tiles × dense solute. Returns (e_lj, e_coul, f_w(3,...,3W),
    f_s(Ns,3), eatom_w, eatom_s, phi_w, phi_s)."""
    W = p.W
    dtype = wxg.dtype
    q_pat, lj_pat, _ = _water_patterns(wm, W, dtype)
    vmask = jnp.repeat(wvalid, 3, axis=-1)

    xi = tuple(wxg[d] for d in range(3))
    xj = tuple(sx[:, d][None, None, None, :] for d in range(3))
    qi = q_pat[None, None, None, :]
    qj = qs[None, None, None, :]
    c6p = lj_pat[:, None] * st.c6_cross[None, :]
    c12p = lj_pat[:, None] * st.c12_cross[None, :]
    eshp = lj_pat[:, None] * st.eshift_cross[None, :]
    w = vmask[..., :, None] * st.smask[None, None, None, None, :]
    bs = _pair_block(xi, xj, box, qi, qj, c6p, c12p, eshp, 1.0, w,
                     style=style, alpha=alpha, rc=rc, double_sided=True)
    f_s = jnp.stack(
        [jnp.sum(bs.fj[d], axis=(0, 1, 2)) for d in range(3)], axis=-1)
    eatom_s = jnp.sum(bs.eatom_j, axis=(0, 1, 2))
    phi_s = jnp.sum(bs.phi_j, axis=(0, 1, 2))
    return (bs.e_lj, bs.e_coul, bs.fi, f_s, bs.eatom_i, eatom_s,
            bs.phi_i, phi_s)


def solute_solute(sx, qs, st: SoluteTables, box, *, style, alpha, rc):
    """Dense all-pairs solute block with exact special tables."""
    Ns = sx.shape[0]
    xi = tuple(sx[:, d] for d in range(3))
    eye = jnp.eye(Ns, dtype=sx.dtype)
    w = st.smask[:, None] * st.smask[None, :] * (1.0 - eye)
    bs = _pair_block(xi, xi, box, qs, qs, st.c6, st.c12, st.eshift,
                     st.scoul, w, style=style, alpha=alpha, rc=rc,
                     double_sided=False)
    return bs.e_lj, bs.e_coul, jnp.stack(bs.fi, axis=-1), bs.eatom_i, bs.phi_i


def water_solute_fast(wxg, sx, qs, st: SoluteTables, wm: WaterModel,
                      p: TileParams, box, *, style, alpha, rc):
    """Hot-path water×solute block.

    Returns (e_lj, e_coul, f_w (3 arrays (gx,gy,gz,A)), f_s (Ns,3),
    phi_s (Ns,)) — drops the per-atom eatom/φ_w tallies the MD step never
    uses (only φ on solute atoms feeds dU/dλ) and uses the same Chebyshev
    screening fits as :func:`water_water_fast`. Solute-pad masks fold into
    the static per-solute LJ coefficients and into q·smask; no water
    validity mask is needed: images are resolved per CELL (nearest solute
    image to the cell center, see the comment below), so parked slots —
    sitting at the far park position relative to their own cell's center —
    stay beyond the cutoff and contribute exactly zero. Validated against
    water_solute in tests/test_tiled.py."""
    import math as _math

    W = p.W
    A = 3 * W
    dtype = wxg.dtype
    rc2 = rc * rc

    q_pat = jnp.asarray(np.tile(np.asarray(wm.q_pattern, np.float64), W),
                        dtype=dtype)                        # (A,)
    lj_pat = np.tile([1.0, 0.0, 0.0], W)                    # O rows only

    if style == "dsf":
        erfc_rc = _math.erfc(alpha * rc)
        e_sh = erfc_rc / rc
        f_sh = erfc_rc / rc**2 + (TWO_OVER_SQRT_PI * alpha
                                  * _math.exp(-((alpha * rc) ** 2)) / rc)
    c_g1, c_g2 = _screening_polys(alpha, rc)

    qj = qs * st.smask                                      # (Ns,) dynamic
    c6p = jnp.asarray(lj_pat[:, None], dtype) * (st.c6_cross * st.smask)
    c12p = jnp.asarray(lj_pat[:, None], dtype) * (st.c12_cross * st.smask)
    eshp = jnp.asarray(lj_pat[:, None], dtype) * (st.eshift_cross * st.smask)

    # per-CELL image resolution instead of per-pair min-image: water
    # atoms sit within cell_half + mol_radius of their cell center, so
    # for every in-cutoff pair the solute atom's nearest image to the
    # CELL CENTER is the right one (ambiguous images are ≥ L/2 −
    # cell_half − mol_radius > rc away and get masked by the cutoff).
    # Drops 3 round+2 fma per pair from the hot loop.
    gx, gy, gz = p.grid
    dx = []
    r2 = None
    for d in range(3):
        g = (gx, gy, gz)[d]
        cc = (jnp.arange(g, dtype=dtype) + 0.5) * (box[d] / g)
        shp = [1, 1, 1]
        shp[d] = g
        cc = cc.reshape(shp + [1])                          # cell centers
        sxd = sx[:, d][None, None, None, :]                 # (1,1,1,Ns)
        img = sxd - box[d] * jnp.round((sxd - cc) / box[d])
        dd = wxg[d][..., :, None] - img[..., None, :]       # (...,A,Ns)
        dx.append(dd)
        r2 = dd * dd if r2 is None else r2 + dd * dd
    r2 = jnp.maximum(r2, R2_MIN)                            # (...,A,Ns)
    in_rc = (r2 < rc2).astype(dtype)

    inv_r = jax.lax.rsqrt(r2)
    inv_r2 = inv_r * inv_r
    r = r2 * inv_r
    if alpha > 0.0:
        t = jnp.minimum(r * (2.0 / rc) - 1.0, 1.0)
        g1 = c_g1[-1]
        for ck in c_g1[-2::-1]:
            g1 = g1 * t + ck
        g2 = c_g2[-1]
        for ck in c_g2[-2::-1]:
            g2 = g2 * t + ck
    else:
        g1 = jnp.ones_like(r)
        g2 = jnp.ones_like(r)
    if style == "dsf":
        u_r = g1 * inv_r - e_sh + f_sh * (r - rc)
        w_r = g2 * inv_r2 * inv_r - f_sh * inv_r
    else:
        u_r = g1 * inv_r
        w_r = g2 * inv_r2 * inv_r
    u_r = u_r * in_rc
    kqq = units.QQR2E * q_pat[:, None] * qj[None, :]
    e_coul = jnp.sum(kqq * u_r)
    qu = q_pat[:, None] * u_r
    phi_s = units.QQR2E * jnp.sum(qu, axis=(0, 1, 2, 3))    # (Ns,)

    inv_r6 = inv_r2 * inv_r2 * inv_r2
    e_lj_p = ((c12p * inv_r6 - c6p) * inv_r6 - eshp) * in_rc
    e_lj = jnp.sum(e_lj_p)
    fpair = (kqq * (w_r * in_rc)
             + (12.0 * c12p * inv_r6 - 6.0 * c6p) * inv_r6 * inv_r2 * in_rc)
    f_w = []
    f_s_d = []
    for d in range(3):
        fd = fpair * dx[d]
        f_w.append(jnp.sum(fd, axis=-1))                    # (...,A)
        f_s_d.append(-jnp.sum(fd, axis=(0, 1, 2, 3)))       # (Ns,)
    f_s = jnp.stack(f_s_d, axis=-1)
    return e_lj, e_coul, f_w, f_s, phi_s


def _roll_shift(box, grid, off, dtype):
    """Per-cell image shifts for a rolled neighbor tile.

    `jnp.roll(x, -off)` hands cell i the coordinates of cell (i+off) mod g.
    For boundary cells the source wrapped around the box; adding ±L puts the
    neighbor in its contiguous image so dx needs NO per-pair min-image
    rounding (coordinates must be box-wrapped at rebin time, which
    layout.rebin/to_tiled guarantee). Returns 3 arrays broadcastable to
    (gx, gy, gz, 1)."""
    shifts = []
    for d in range(3):
        g = grid[d]
        s = np.zeros(g, dtype=np.float32)
        if off[d] == 1:
            s[g - 1] = 1.0
        elif off[d] == -1:
            s[0] = -1.0
        shape = [1, 1, 1, 1]
        shape[d] = g
        shifts.append(jnp.asarray(s.reshape(shape), dtype=dtype) * box[d])
    return shifts


def _screening_polys(alpha: float, rc: float, deg: int = 10):
    """Host-side Chebyshev fits of the Coulomb screening factors over
    r ∈ [0, rc], returned as ascending power-series coefficients in
    t = 2r/rc − 1 (Horner in t keeps every power in [−1, 1] — stable in
    f32). g1(r) = erfc(αr); g2(r) = erfc(αr) + (2/√π)·αr·exp(−α²r²)."""
    import math

    from numpy.polynomial import chebyshev as _Ch

    erfc = np.vectorize(math.erfc)
    nodes = (np.cos(np.pi * (np.arange(deg + 1) + 0.5) / (deg + 1)) + 1) / 2
    r = nodes * rc
    ar = alpha * r
    g1 = erfc(ar)
    g2 = g1 + TWO_OVER_SQRT_PI * ar * np.exp(-ar * ar)
    t = 2 * nodes - 1
    c1 = _Ch.cheb2poly(_Ch.chebfit(t, g1, deg))
    c2 = _Ch.cheb2poly(_Ch.chebfit(t, g2, deg))
    return tuple(float(c) for c in c1), tuple(float(c) for c in c2)


def water_water_fast(wxg, wm: WaterModel, p: TileParams, box,
                     *, style, alpha, rc, full_stencil=False,
                     chunk_k_coul=None, chunk_k_lj=None):
    """Hot-path water-water block: forces + total energies only.

    Faster than :func:`water_water` by dropping per-pair work the MD step
    never uses (SURVEY.md §7.3 item 3 — this block is ~80% of the step):
      - no per-atom eatom/φ tallies (diagnostics go through the tally
        oracle path in compute_Hs);
      - no validity-mask multiplies: invalid slots are PARKED at unique
        positions ≥ 100 Å apart (layout.rebin), so they fall outside the
        cutoff arithmetic;
      - no per-pair min-image rounding: rolled tiles get per-cell boundary
        image shifts (coordinates are box-wrapped at rebin);
      - LJ runs on the O-O sub-block only (1/9 of atom pairs) instead of
        masked LJ math on all pairs;
      - the charge-product matrix QQR2E·q_i·q_j is a static constant;
      - the 13 rolled neighbor tiles + the self tile are concatenated
        along the LANE dim in chunks sized so each chunk's lane width
        lands just under a multiple of 128 (see _chunk_plan below) —
        amortizes TPU lane padding without giant-fusion overhead.

    Requires grid ≥ 3 per dim. Validated against water_water in
    tests/test_tiled.py."""
    import math as _math

    gx, gy, gz = p.grid
    W = p.W
    A = 3 * W
    dtype = wxg.dtype
    rc2 = rc * rc

    q_pat = np.tile(np.asarray(wm.q_pattern, np.float64), W)
    a_idx = np.arange(A)

    if style == "dsf":
        erfc_rc = _math.erfc(alpha * rc)
        e_sh = erfc_rc / rc
        f_sh = erfc_rc / rc**2 + (TWO_OVER_SQRT_PI * alpha
                                  * _math.exp(-((alpha * rc) ** 2)) / rc)

    # screening factors as degree-10 Chebyshev fits in r (NOT r²: erfc(α√s)
    # has infinite slope at s=0) — removes the exp and the divide from the
    # per-pair VPU work (the two most expensive ops in the hot loop).
    # g1 = erfc(αr) (energy), g2 = erfc(αr) + (2/√π)αr·e^{−α²r²} (force);
    # max |err| ≈ 4e-7 over [0, rc] in f32 Horner (beyond-cutoff pairs are
    # masked, so only boundedness matters there — t is clamped to the fit
    # domain to keep parked far-away slots finite).
    c_g1, c_g2 = _screening_polys(alpha, rc)

    def coul_uw(r2):
        """(u_r, w_r) for unit charge product; r2 pre-clamped."""
        inv_r = jax.lax.rsqrt(r2)
        inv_r2 = inv_r * inv_r
        r = r2 * inv_r
        if alpha > 0.0:
            t = jnp.minimum(r * (2.0 / rc) - 1.0, 1.0)
            erfc_ar = c_g1[-1]
            for ck in c_g1[-2::-1]:
                erfc_ar = erfc_ar * t + ck
            g2 = c_g2[-1]
            for ck in c_g2[-2::-1]:
                g2 = g2 * t + ck
        else:
            erfc_ar = jnp.ones_like(r)
            g2 = jnp.ones_like(r)
        if style == "dsf":
            u_r = erfc_ar * inv_r - e_sh + f_sh * (r - rc)
            w_r = g2 * inv_r2 * inv_r - f_sh * inv_r
        else:
            u_r = erfc_ar * inv_r
            w_r = g2 * inv_r2 * inv_r
        return u_r, w_r

    xi = tuple(wxg[d] for d in range(3))
    xo_i = tuple(wxg[d][..., 0::3] for d in range(3))       # (gx,gy,gz,W)

    # -- merged-lane stencil: all 13 rolled neighbor tiles + the self tile
    # concatenated along the LANE dim into one (A, 14A) pair block.
    # Rationale: per-offset (A, A) blocks pad A to the next multiple of 128
    # lanes (A=168 → 256: 52% wasted VPU work; the O-only LJ block W=56 →
    # 128: 129% waste). One merged (A, 14A) block pads 2352 → 2432 (3%).
    # The self-segment exclusions (same molecule / same O) and the 0.5
    # energy de-duplication fold into static per-segment charge-product
    # and LJ prefactor matrices, so the merged block is maskless too. --
    vaxes = (0, 1, 2)
    # full_stencil mode: all 26 neighbor offsets, i-side-only accumulation
    # (every unordered pair computed from both cells; no j-side reductions,
    # no roll-backs) — 2x the ideal pair math of the half stencil, but a
    # single reduction axis. Measured on v5e (examples/probe_ww_variants.py)
    # XLA multi-output-fuses the two reduction axes of the half-stencil
    # block in one pass, so half wins (4.7 vs 7.3 ms at A=228); the flag is
    # kept for future re-probes.
    stencil = (tuple(o for off in p.half_stencil
                     for o in (off, tuple(-x for x in off)))
               if full_stencil else p.half_stencil)
    nseg = len(stencil) + 1
    xj_segs, xo_segs = [], []
    for d in range(3):
        segs = []
        for off in stencil:
            sh = tuple(-o for o in off)
            shift = _roll_shift(box, p.grid, off, dtype)[d]
            segs.append(jnp.roll(wxg[d], sh, axis=vaxes) + shift)
        segs.append(wxg[d])                                  # self segment
        xj_segs.append(segs)
        xo_segs.append([s[..., 0::3] for s in segs])

    # static per-segment pair prefactors. Self segment: exclude
    # same-molecule pairs; in half-stencil mode also halve it — the self
    # block is a full (both-orders) matrix, and by h-symmetry /
    # dx-antisymmetry its i-side and j-side force sums are identical, so
    # the 0.5 makes fi + fj count each pair once (and de-duplicates the
    # energy sum the same way).
    kqq_np = np.asarray(units.QQR2E * q_pat[:, None] * q_pat[None, :])
    nsm = (a_idx[:, None] // 3) != (a_idx[None, :] // 3)
    kqq_all = np.tile(kqq_np, (1, nseg))
    ljm_all = np.ones((W, nseg * W))
    if full_stencil:
        # i-side-only: force weight 1 everywhere (each pair seen from both
        # cells); every pair appears twice, so energies get a global 0.5
        kqq_all[:, -A:] *= nsm
        ljm_all[:, -W:] = 1.0 - np.eye(W)
        e_scale = 0.5
    else:
        kqq_all[:, -A:] *= 0.5 * nsm
        ljm_all[:, -W:] = 0.5 * (1.0 - np.eye(W))
        e_scale = 1.0

    # chunk plan: shared cost model with retile_auto (layout.pair_chunk_plan)
    def _chunk_plan(n):
        return pair_chunk_plan(n, nseg)[0]

    seg_offsets = list(stencil) + [None]                   # None = self

    def fold_j(acc, fj_c, s, e, n):
        """roll the j-side chunk sums back onto their source cells."""
        fj = fj_c.reshape(fj_c.shape[:-1] + (e - s, n))
        for i, idx in enumerate(range(s, e)):
            off = seg_offsets[idx]
            c = fj[..., i, :]
            acc = acc + (c if off is None else jnp.roll(c, off, axis=vaxes))
        return acc

    # Coulomb over chunked merged blocks
    kA = chunk_k_coul or _chunk_plan(A)
    e_coul = jnp.zeros((), dtype)
    f = [jnp.zeros_like(wxg[d]) for d in range(3)]
    for s in range(0, nseg, kA):
        e = min(s + kA, nseg)
        xj_c = [jnp.concatenate(xj_segs[d][s:e], axis=-1) for d in range(3)]
        kqq_c = jnp.asarray(kqq_all[:, s * A:e * A], dtype=dtype)
        dx = [xi[d][..., :, None] - xj_c[d][..., None, :] for d in range(3)]
        r2 = jnp.maximum(dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2],
                         R2_MIN)
        in_rc = (r2 < rc2).astype(dtype)
        u_r, w_r = coul_uw(r2)
        e_coul = e_coul + jnp.sum(kqq_c * (u_r * in_rc))
        h = kqq_c * (w_r * in_rc)
        for d in range(3):
            hd = h * dx[d]
            f[d] = f[d] + jnp.sum(hd, axis=-1)
            if not full_stencil:
                f[d] = fold_j(f[d], -jnp.sum(hd, axis=-2), s, e, A)
    e_coul = e_scale * e_coul

    # O-O LJ over chunked merged blocks
    kW = chunk_k_lj or _chunk_plan(W)
    e_lj = jnp.zeros((), dtype)
    fO = [jnp.zeros_like(xo_i[d]) for d in range(3)]
    for s in range(0, nseg, kW):
        e = min(s + kW, nseg)
        xo_c = [jnp.concatenate(xo_segs[d][s:e], axis=-1) for d in range(3)]
        ljm_c = jnp.asarray(ljm_all[:, s * W:e * W], dtype=dtype)
        dxo = [xo_i[d][..., :, None] - xo_c[d][..., None, :]
               for d in range(3)]
        r2o = jnp.maximum(dxo[0] * dxo[0] + dxo[1] * dxo[1]
                          + dxo[2] * dxo[2], R2_MIN)
        in_rco = ljm_c * (r2o < rc2).astype(dtype)
        inv_r2 = 1.0 / r2o
        inv_r6 = inv_r2 * inv_r2 * inv_r2
        e_lj = e_lj + jnp.sum(
            ((wm.c12_OO * inv_r6 - wm.c6_OO) * inv_r6 - wm.eshift_OO)
            * in_rco)
        fpo = ((12.0 * wm.c12_OO * inv_r6 - 6.0 * wm.c6_OO) * inv_r6
               * inv_r2 * in_rco)
        for d in range(3):
            fpd = fpo * dxo[d]
            fO[d] = fO[d] + jnp.sum(fpd, axis=-1)
            if not full_stencil:
                fO[d] = fold_j(fO[d], -jnp.sum(fpd, axis=-2), s, e, W)
    e_lj = e_scale * e_lj
    for d in range(3):
        f[d] = f[d].at[..., 0::3].add(fO[d])
    return e_lj, e_coul, f


def water_intra_ewald_correction(wm: WaterModel, n_waters, alpha: float):
    """Constant energy correction for rigid-water intra-molecular pairs
    under Ewald: the same-molecule mask removes the real-space −erf
    compensation that the reciprocal sum needs (see ops/pair.py screening).
    Rigid geometry ⇒ the correction is a constant; its internal forces do
    no work on a rigid body (projected by SHAKE/RATTLE)."""
    import math

    qO, qH = wm.q_pattern[0], wm.q_pattern[1]
    e = (2.0 * qO * qH * math.erf(alpha * wm.d_OH) / wm.d_OH
         + qH * qH * math.erf(alpha * wm.d_HH) / wm.d_HH)
    return -units.QQR2E * e * n_waters
