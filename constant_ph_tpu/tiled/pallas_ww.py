"""Pallas water-water kernel (validated alternative to the XLA hot path).

This kernel keeps everything in VMEM: the pallas grid runs over cells, the
27 stencil neighbors arrive as 27 BlockSpec VIEWS of the same tile array
(index_map = (c+offset) mod grid — the pipeline double-buffers the DMAs),
and each (A, A) pair block is computed and reduced on the VPU without ever
touching HBM. i-side-only accumulation over the full stencil (every pair
computed from both cells) avoids cross-block writes entirely.

Status: the production hot path is tiled/forces.water_water_fast — XLA
multi-output-fuses the half-stencil chunked-lane blocks without
materializing pair intermediates, and with half the pair math (both-side
accumulation), masklessness, and Chebyshev screening it measures ~4×
faster than this kernel (2.5 vs 10.5 ms at 24k atoms, W=64). The kernel
is kept as the Pallas reference implementation, the full-tally oracle in
interpret mode (tests/test_pallas_ww.py — the SURVEY §5.2 "sanitizer"
policy), and the starting point if a future Mosaic version changes the
fusion picture.

Tile row layout (8, A) with A = 3W atom slots:
  0..2 x,y,z · 3 charge (pattern×valid, 0 for pads) · 4 LJ mask (valid O
  slots) · 5 validity · 6..7 pad.
Outputs per cell (8, A): 0..2 force xyz · 3 eatom_lj · 4 eatom_coul · 5 φ.

Validated against tiled/forces.water_water in tests/test_pallas_ww.py
(the SURVEY.md §5.2 interpret-mode "sanitizer" policy).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from constant_ph_tpu import units
from constant_ph_tpu.ops.kernels import R2_MIN, TWO_OVER_SQRT_PI
from constant_ph_tpu.tiled.layout import TileParams, WaterModel


def _erfc_pos(x, expmx2):
    """erfc(x) for x ≥ 0 via Abramowitz–Stegun 7.1.26 (|ε| < 1.5e-7 —
    below f32 resolution; Mosaic has no native erfc lowering).
    `expmx2` = exp(−x²), shared with the Ewald gaussian term."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * expmx2


def _offsets():
    out = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                out.append((ox, oy, oz))
    return out


def make_ww_kernel(p: TileParams, wm: WaterModel, *, style: str,
                   alpha: float, rc: float, interpret: bool = False):
    """Build the fused kernel: (box (1,3), wt (gx,gy,gz,8,A)) →
    out (gx,gy,gz,8,A). Box rides in SMEM (jit-traceable, NPT-ready)."""
    gx, gy, gz = p.grid
    if min(p.grid) < 3:
        raise ValueError(
            "pallas water-water kernel needs grid ≥ 3 per dim (the 27 "
            "stencil views would alias); use tiled.forces.water_water")
    A = 3 * p.W
    rc2 = rc * rc
    c6_OO, c12_OO, esh_OO = wm.c6_OO, wm.c12_OO, wm.eshift_OO
    offsets = _offsets()

    if style == "dsf":
        erfc_rc = math.erfc(alpha * rc)
        e_sh = erfc_rc / rc
        f_sh = erfc_rc / rc**2 + (
            TWO_OVER_SQRT_PI * alpha * math.exp(-((alpha * rc) ** 2)) / rc)

    # The 27-offset stencil is a GRID dimension (matmul-K-style
    # accumulation): one offset body per grid step keeps VMEM pressure at a
    # handful of (A, A) temporaries (a fully unrolled 27-offset body
    # overflowed the 16 MB VMEM stack), and the out block — whose index_map
    # ignores k — stays resident across the inner k sweep.

    def kernel(box_ref, self_ref, nbr_ref, out_ref):
        k = pl.program_id(3)
        bx = box_ref[0, 0]
        by = box_ref[0, 1]
        bz = box_ref[0, 2]
        self_tile = self_ref[0, 0, 0]
        tile = nbr_ref[0, 0, 0]
        xi = [self_tile[d, :] for d in range(3)]
        qi = self_tile[3, :]
        lji = self_tile[4, :]
        vi = self_tile[5, :]

        dxd = []
        r2 = None
        for d, L in enumerate((bx, by, bz)):
            dd = xi[d][:, None] - tile[d, :][None, :]
            dd = dd - L * jnp.round(dd * (1.0 / L))
            dxd.append(dd)
            r2 = dd * dd if r2 is None else r2 + dd * dd
        w = vi[:, None] * tile[5, :][None, :]
        # self offset (k == 13): exclude same-molecule pairs (incl. i==j)
        slot = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
        slot_j = jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
        not_same_mol = ((slot // 3) != (slot_j // 3)).astype(jnp.float32)
        w = w * jnp.where(k == 13, not_same_mol, 1.0)

        r2 = jnp.where(w > 0, jnp.maximum(r2, R2_MIN), rc2 + 1.0)
        in_rc = (r2 < rc2).astype(jnp.float32)
        inv_r2 = 1.0 / r2
        r = jnp.sqrt(r2)

        # LJ (O-O only via the lj-mask rows)
        ljp = lji[:, None] * tile[4, :][None, :]
        inv_r6 = inv_r2 * inv_r2 * inv_r2
        e_lj_p = ((c12_OO * inv_r6 - c6_OO) * inv_r6 - esh_OO) * ljp * in_rc
        f_lj = (12.0 * c12_OO * inv_r6 - 6.0 * c6_OO) * inv_r6 \
            * inv_r2 * ljp * in_rc

        # Coulomb
        if alpha > 0.0:
            ar = alpha * r
            expmx2 = jnp.exp(-ar * ar)
            erfc_ar = _erfc_pos(ar, expmx2)
            gauss = TWO_OVER_SQRT_PI * ar * expmx2
        else:
            erfc_ar = jnp.ones_like(r)
            gauss = jnp.zeros_like(r)
        if style == "dsf":
            u_r = erfc_ar / r - e_sh + f_sh * (r - rc)
            w_r = (erfc_ar + gauss) * inv_r2 / r - f_sh / r
        else:
            u_r = erfc_ar / r
            w_r = (erfc_ar + gauss) * inv_r2 / r
        u_r = u_r * in_rc
        w_r = w_r * in_rc
        qj = tile[3, :][None, :]
        kqq = units.QQR2E * qi[:, None] * qj
        e_c_p = kqq * u_r
        f_c = kqq * w_r

        fpair = f_lj + f_c
        zero = jnp.zeros((A,), jnp.float32)
        contrib = jnp.stack(
            [jnp.sum(fpair * dxd[0], axis=1),
             jnp.sum(fpair * dxd[1], axis=1),
             jnp.sum(fpair * dxd[2], axis=1),
             0.5 * jnp.sum(e_lj_p, axis=1),
             0.5 * jnp.sum(e_c_p, axis=1),
             units.QQR2E * jnp.sum(qj * u_r, axis=1),
             zero, zero], axis=0)

        @pl.when(k == 0)
        def _():
            out_ref[0, 0, 0] = contrib

        @pl.when(k != 0)
        def _():
            out_ref[0, 0, 0] = out_ref[0, 0, 0] + contrib

    def nbr_imap(cx, cy, cz, k):
        return ((cx + k // 9 - 1) % gx,
                (cy + (k // 3) % 3 - 1) % gy,
                (cz + k % 3 - 1) % gz, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 3), lambda cx, cy, cz, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1, 8, A),
                     lambda cx, cy, cz, k: (cx, cy, cz, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, 8, A), nbr_imap, memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, 1, 8, A), lambda cx, cy, cz, k: (cx, cy, cz, 0, 0),
        memory_space=pltpu.VMEM)

    def call(box, wt):
        box2 = jnp.reshape(box.astype(jnp.float32), (1, 3))
        return pl.pallas_call(
            kernel,
            grid=(gx, gy, gz, 27),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz, 8, A), jnp.float32),
            interpret=interpret,
        )(box2, wt, wt)

    return call


def pack_water_tiles(wxg, wvalid, wm: WaterModel, p: TileParams):
    """(3,gx,gy,gz,A) coords + (gx,gy,gz,W) validity → (gx,gy,gz,8,A)."""
    gx, gy, gz = p.grid
    A = 3 * p.W
    dtype = wxg.dtype
    q_pat = jnp.asarray(np.tile(wm.q_pattern, p.W), dtype=dtype)
    lj_pat = jnp.asarray(np.tile([1.0, 0.0, 0.0], p.W), dtype=dtype)
    vm = jnp.repeat(wvalid, 3, axis=-1)                     # (gx,gy,gz,A)
    rows = [wxg[0], wxg[1], wxg[2],
            q_pat[None, None, None, :] * vm,
            lj_pat[None, None, None, :] * vm,
            vm,
            jnp.zeros_like(vm), jnp.zeros_like(vm)]
    return jnp.stack(rows, axis=3)                          # (gx,gy,gz,8,A)


def water_water_pallas(wxg, wvalid, wm: WaterModel, p: TileParams, box, *,
                       style, alpha, rc, interpret=False):
    """Drop-in replacement for tiled.forces.water_water."""
    call = make_ww_kernel(p, wm, style=style, alpha=alpha, rc=rc,
                          interpret=interpret)
    wt = pack_water_tiles(wxg, wvalid, wm, p)
    out = call(box, wt)
    f = [out[..., d, :] for d in range(3)]
    eatom = out[..., 3, :] + out[..., 4, :]
    phi = out[..., 5, :]
    e_lj = jnp.sum(out[..., 3, :])
    e_coul = jnp.sum(out[..., 4, :])
    return e_lj, e_coul, f, eatom, phi


# ---------------------------------------------------------------------------
# Fair-rematch kernel: the hot-path math of tiled/forces.water_water_fast
# (parked-maskless layout, per-cell image shifts, Chebyshev screening,
# O-O-only LJ, chunked lane merging) with each merged chunk's pair block +
# both-side reductions fused in ONE Pallas kernel over a grid of cells.
# Data prep (rolls, lane concat, static prefactors) is IDENTICAL to the
# XLA path, so a timing diff measures Mosaic codegen vs XLA fusion on the
# same arithmetic — the like-for-like comparison DESIGN.md §2 cites.
# ---------------------------------------------------------------------------


def _chunk_pair_kernel(n_rows, Lc, c_g1, c_g2, *, style, alpha, rc,
                       e_sh=0.0, f_sh=0.0, lj=False, c6=0.0, c12=0.0,
                       esh=0.0):
    """Kernel body for one merged chunk: rows (n_rows) x lanes (Lc).

    Coulomb mode: pref_ref = static QQR2E*qi*qj (with the self-segment
    0.5/not-same-molecule factors folded in); outputs per-i force rows +
    a per-i energy row, and the j-side force rows for roll-back.
    LJ mode (lj=True): O-O rows only; pref_ref = the {0,0.5,1} pair
    weight; c6/c12/eshift are scalars."""
    rc2 = rc * rc

    def kernel(xi_ref, xj_ref, pref_ref, fi_ref, fj_ref):
        xi = xi_ref[0]                                     # (3/8, n_rows)
        xj = xj_ref[0]                                     # (3/8, Lc)
        pref = pref_ref[:]                                 # (n_rows, Lc)
        dx = []
        r2 = None
        for d in range(3):
            dd = xi[d, :][:, None] - xj[d, :][None, :]
            dx.append(dd)
            r2 = dd * dd if r2 is None else r2 + dd * dd
        r2 = jnp.maximum(r2, R2_MIN)
        in_rc = (r2 < rc2).astype(jnp.float32)
        inv_r2 = 1.0 / r2
        if lj:
            inv_r6 = inv_r2 * inv_r2 * inv_r2
            wgt = pref * in_rc
            e_p = ((c12 * inv_r6 - c6) * inv_r6 - esh) * wgt
            h = (12.0 * c12 * inv_r6 - 6.0 * c6) * inv_r6 * inv_r2 * wgt
        else:
            inv_r = jax.lax.rsqrt(r2)
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
            e_p = pref * (u_r * in_rc)
            h = pref * (w_r * in_rc)

        rows_i = [jnp.sum(h * dx[d], axis=1) for d in range(3)]
        rows_i.append(jnp.sum(e_p, axis=1))                # per-i energy
        rows_j = [-jnp.sum(h * dx[d], axis=0) for d in range(3)]
        zi = jnp.zeros((n_rows,), jnp.float32)
        zj = jnp.zeros((Lc,), jnp.float32)
        fi_ref[0] = jnp.stack(rows_i + [zi] * 4, axis=0)
        fj_ref[0] = jnp.stack(rows_j + [zj] * 5, axis=0)

    return kernel


def _run_chunks(xi_t, segs, pref_all, n_rows, nseg, kchunk,
                seg_offsets, grid3, *, interpret, **kw):
    """Launch one pallas_call per merged chunk; return (f_rows (3,...),
    e_rows) with the j-side chunk sums already rolled back."""
    gx, gy, gz = grid3
    N = gx * gy * gz
    vaxes = (0, 1, 2)
    f_acc = None
    e_acc = None
    for s in range(0, nseg, kchunk):
        e = min(s + kchunk, nseg)
        Lc = (e - s) * n_rows
        xj_c = jnp.concatenate([segs[i] for i in range(s, e)], axis=-1)
        pref_c = jnp.asarray(pref_all[:, s * n_rows:e * n_rows], jnp.float32)
        kern = _chunk_pair_kernel(n_rows, Lc, kw["c_g1"], kw["c_g2"],
                                  style=kw["style"], alpha=kw["alpha"],
                                  rc=kw["rc"], e_sh=kw.get("e_sh", 0.0),
                                  f_sh=kw.get("f_sh", 0.0),
                                  lj=kw.get("lj", False),
                                  c6=kw.get("c6", 0.0),
                                  c12=kw.get("c12", 0.0),
                                  esh=kw.get("esh", 0.0))
        fi, fj = pl.pallas_call(
            kern,
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, 8, n_rows), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, Lc), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rows, Lc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, n_rows), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, Lc), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 8, n_rows), jnp.float32),
                jax.ShapeDtypeStruct((N, 8, Lc), jnp.float32),
            ],
            interpret=interpret,
        )(xi_t, xj_c, pref_c)
        fi = fi.reshape(gx, gy, gz, 8, n_rows)
        facc_c = [fi[..., d, :] for d in range(3)]
        e_c = fi[..., 3, :]
        fj = fj.reshape(gx, gy, gz, 8, e - s, n_rows)
        for i, idx in enumerate(range(s, e)):
            off = seg_offsets[idx]
            for d in range(3):
                c = fj[..., d, i, :]
                facc_c[d] = facc_c[d] + (
                    c if off is None else jnp.roll(c, off, axis=vaxes))
        if f_acc is None:
            f_acc, e_acc = facc_c, e_c
        else:
            f_acc = [f_acc[d] + facc_c[d] for d in range(3)]
            e_acc = e_acc + e_c
    return f_acc, e_acc


def water_water_pallas_fast(wxg, wm: WaterModel, p: TileParams, box, *,
                            style, alpha, rc, interpret=False,
                            chunk_k_coul=None, chunk_k_lj=None):
    """Hot-path water-water block (forces + total energies, no tallies)
    with the chunk pair math in Pallas. Mirrors water_water_fast's
    layout/tricks exactly — see module comment above. Requires grid ≥ 3
    per dim (stencil views alias below that)."""
    from constant_ph_tpu.tiled.forces import (
        _roll_shift, _screening_polys)
    from constant_ph_tpu.tiled.layout import pair_chunk_plan

    gx, gy, gz = p.grid
    if min(p.grid) < 3:
        raise ValueError("pallas fast ww kernel needs grid >= 3 per dim")
    W = p.W
    A = 3 * W
    N = gx * gy * gz
    dtype = wxg.dtype

    q_pat = np.tile(np.asarray(wm.q_pattern, np.float64), W)
    a_idx = np.arange(A)

    e_sh = f_sh = 0.0
    if style == "dsf":
        erfc_rc = math.erfc(alpha * rc)
        e_sh = erfc_rc / rc
        f_sh = erfc_rc / rc**2 + (TWO_OVER_SQRT_PI * alpha
                                  * math.exp(-((alpha * rc) ** 2)) / rc)
    c_g1, c_g2 = _screening_polys(alpha, rc)

    vaxes = (0, 1, 2)
    stencil = p.half_stencil
    nseg = len(stencil) + 1
    seg_offsets = list(stencil) + [None]

    # packed (N, 8, n) i-side tiles and per-segment j-side tiles: rows
    # 0..2 = x,y,z (rows 3..7 zero-padding keeps the 8-sublane layout)
    def pack(cols):          # cols: 3 arrays (gx,gy,gz,n) -> (N, 8, n)
        n = cols[0].shape[-1]
        z = jnp.zeros_like(cols[0])
        return jnp.stack(list(cols) + [z] * 5, axis=3).reshape(N, 8, n)

    xi_t = pack([wxg[d] for d in range(3)])
    xo_t = pack([wxg[d][..., 0::3] for d in range(3)])

    segsA, segsO = [], []
    for off in stencil:
        sh = tuple(-o for o in off)
        shift = _roll_shift(box, p.grid, off, dtype)
        rolled = [jnp.roll(wxg[d], sh, axis=vaxes) + shift[d]
                  for d in range(3)]
        segsA.append(pack(rolled))
        segsO.append(pack([r[..., 0::3] for r in rolled]))
    segsA.append(xi_t)
    segsO.append(xo_t)

    # static prefactors — identical to water_water_fast (half stencil)
    kqq_np = np.asarray(units.QQR2E * q_pat[:, None] * q_pat[None, :])
    nsm = (a_idx[:, None] // 3) != (a_idx[None, :] // 3)
    kqq_all = np.tile(kqq_np, (1, nseg))
    kqq_all[:, -A:] *= 0.5 * nsm
    ljm_all = np.ones((W, nseg * W))
    ljm_all[:, -W:] = 0.5 * (1.0 - np.eye(W))

    kA = chunk_k_coul or pair_chunk_plan(A, nseg)[0]
    kW = chunk_k_lj or pair_chunk_plan(W, nseg)[0]

    f, e_rows = _run_chunks(
        xi_t, segsA, kqq_all, A, nseg, kA,
        seg_offsets, p.grid, interpret=interpret,
        c_g1=c_g1, c_g2=c_g2, style=style, alpha=alpha, rc=rc,
        e_sh=e_sh, f_sh=f_sh)
    e_coul = jnp.sum(e_rows)

    fO, eO_rows = _run_chunks(
        xo_t, segsO, ljm_all, W, nseg, kW,
        seg_offsets, p.grid, interpret=interpret,
        c_g1=c_g1, c_g2=c_g2, style=style, alpha=alpha, rc=rc,
        lj=True, c6=wm.c6_OO, c12=wm.c12_OO, esh=wm.eshift_OO)
    e_lj = jnp.sum(eO_rows)

    for d in range(3):
        f[d] = f[d].at[..., 0::3].add(fO[d])
    return e_lj, e_coul, f
