"""Smooth particle-mesh Ewald (PME) on the cell-tile layout — the
"PPPM reciprocal space as batched XLA FFTs" component (SURVEY.md §2.3.13;
the reference consumes its host's PPPM through force->kspace->eatom,
fix_constant_pH.cpp:241-244).

TPU-native design: GPU PME spreads charge with scatter-adds — the op TPUs
hate most. Here atoms already live in cell tiles (tiled/layout.py), and the
mesh is ALIGNED to the cell grid (M_d = g_d · m), so:

  - spreading: each cell computes an EXTENDED local mesh block
    (m + 2h per dim) from its own atoms via separable B-spline factor
    matmuls — Q_ext = Bx @ (By ⊙ Bz ⊙ q) — pure MXU work, no scatter;
  - the extended blocks overlap-add into the global mesh with three
    pad/roll slices per dimension (h ≤ m, so only ±1 cells overlap);
  - the convolution with the influence function runs as one rfftn/irfftn
    pair (batched XLA FFT);
  - interpolation (forces, φ = ∂U/∂q for dU/dλ) is the exact transpose:
    extract extended blocks with rolls, contract with (B, dB) factors.

B-splines are evaluated branchlessly with the clamped truncated-power form
(clipping the argument to [0, p] makes out-of-support — including PARKED
invalid slots at 10⁴ Å, layout.PARK_BASE — evaluate to exactly 0).

Energy convention matches ops.ewald: U_rec = C·2π/V Σ_{k≠0}
e^{−k²/4α²}/k² |S(k)|², with the same self-energy and neutralizing
background terms, so PME is a drop-in for ewald_recip on the tiled hot
path (same real-space screening in ops.pair / tiled.forces).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units

_SQRT_PI = 1.7724538509055159


@struct.dataclass
class PMEParams:
    alpha: float = struct.field(pytree_node=False)
    grid: tuple = struct.field(pytree_node=False)    # cell grid (gx,gy,gz)
    m: tuple = struct.field(pytree_node=False)       # mesh pts per cell/dim
    p: int = struct.field(pytree_node=False)         # B-spline order
    h: tuple = struct.field(pytree_node=False)       # halo cells (mesh pts)
    mesh: tuple = struct.field(pytree_node=False)    # (Mx, My, Mz)
    volume: float = struct.field(pytree_node=False)
    spacing: tuple = struct.field(pytree_node=False)
    Ahat: jax.Array      # (Mx, My, Mz//2+1) single-count influence incl |b|⁻²
    box: jax.Array       # (3,)
    # live-box (NPT) support: everything box-dependent in Âhat factors into
    # prefactor(V) · exp(−k²/4α²)/k² with k_d = 2π·n_d/L_d — given the
    # box-INDEPENDENT pieces below (integer mesh frequencies + B-spline
    # Euler factors), Âhat for the CURRENT box is cheap elementwise device
    # math (the ROADMAP "NPT + k-space" extension point; ~M³/2 exp+div per
    # k-space evaluation, negligible next to the FFT pair).
    binv: jax.Array      # (Mx, My, Mz//2+1) 1/(|bx|²|by|²|bz|²)
    nx: jax.Array        # (Mx,) integer FFT frequencies
    ny: jax.Array        # (My,)
    nzr: jax.Array       # (Mz//2+1,) rfft frequencies


def _bspline_phi2(p: int, M: int) -> np.ndarray:
    """|b(k)|² Euler factors of the cardinal B-spline, length M."""
    k = np.arange(M)
    denom = np.zeros(M, dtype=np.complex128)
    for j in range(p - 1):
        denom += _bspline_np(np.array([j + 1.0]), p)[0] * np.exp(
            2j * np.pi * k * j / M)
    mag2 = np.abs(denom) ** 2
    # guard: for even p the denominator never vanishes; clamp anyway
    return np.maximum(mag2, 1e-14)


def _bspline_np(u, p: int):
    """Cardinal B-spline M_p(u) on [0, p] (host-side, for |b|²)."""
    out = np.zeros_like(u, dtype=np.float64)
    for k in range(p + 1):
        out += ((-1.0) ** k * math.comb(p, k)
                * np.maximum(u - k, 0.0) ** (p - 1))
    return out / math.factorial(p - 1)


def make_pme_params(box, cell_grid, alpha: float, *, spacing: float = 0.9,
                    p: int = 6, slack: float | None = None,
                    skin: float = 2.0, mol_radius: float = 1.0,
                    dtype=jnp.float32) -> PMEParams:
    """Host-side PME setup.

    `cell_grid` is the tile grid (TileParams.grid); the mesh per dim is the
    smallest even m with g·m ≥ L/spacing. `slack` bounds how far an atom can
    sit outside its bin cell and sizes the halo h = p/2 + ceil(slack/spacing).
    By default it is derived from the same worst case the tile layout
    accepts: centroid rebinning parks an atom up to `mol_radius` outside its
    cell and the dangerous-build monitor tolerates up to `skin` of drift per
    block — pass the TileParams values so the B-spline support is never
    clipped for any accepted excursion."""
    if p % 2 != 0:
        # odd-order cardinal B-splines have b(k)=0 at the Nyquist
        # frequency for even mesh sizes — the influence function blows
        # up there (measured: p=5 mesh 84³ gave frel 3.2e-2 vs the Ewald
        # oracle where p=4/p=6 sit at 1e-4). Even orders only.
        raise ValueError(f"PME B-spline order must be even, got p={p}")
    if slack is None:
        slack = mol_radius + skin
    box = np.asarray(box, dtype=np.float64)
    V = float(np.prod(box))
    g = tuple(int(x) for x in cell_grid)
    m = tuple(int(2 * math.ceil(L / (spacing * gd * 2))) for L, gd in
              zip(box, g))
    M = tuple(gd * md for gd, md in zip(g, m))
    sp = tuple(float(L / Md) for L, Md in zip(box, M))
    h = tuple(int(p // 2 + math.ceil(slack / s)) for s in sp)
    for hd, md in zip(h, m):
        if hd > md:
            raise ValueError(
                f"PME halo {h} exceeds per-cell mesh {m}; increase mesh "
                f"resolution (smaller spacing) or cell size")

    kx = 2 * np.pi * np.fft.fftfreq(M[0], d=1.0) * M[0] / box[0]
    ky = 2 * np.pi * np.fft.fftfreq(M[1], d=1.0) * M[1] / box[1]
    kz = 2 * np.pi * np.fft.rfftfreq(M[2], d=1.0) * M[2] / box[2]
    KX, KY, KZ = np.meshgrid(kx, ky, kz, indexing="ij")
    k2 = KX**2 + KY**2 + KZ**2
    with np.errstate(divide="ignore", invalid="ignore"):
        A = np.where(k2 > 1e-12,
                     np.exp(-k2 / (4 * alpha * alpha)) / k2, 0.0)
    A *= units.QQR2E * 2.0 * np.pi / V
    bx = _bspline_phi2(p, M[0])
    by = _bspline_phi2(p, M[1])
    bz = _bspline_phi2(p, M[2])[: M[2] // 2 + 1]
    binv = 1.0 / (bx[:, None, None] * by[None, :, None] * bz[None, None, :])
    A *= binv

    return PMEParams(
        alpha=float(alpha), grid=g, m=m, p=int(p), h=h, mesh=M,
        volume=V, spacing=sp,
        Ahat=jnp.asarray(A, dtype=jnp.float32),
        box=jnp.asarray(box, dtype=dtype),
        binv=jnp.asarray(binv, dtype=jnp.float32),
        nx=jnp.asarray(np.rint(np.fft.fftfreq(M[0]) * M[0]),
                       dtype=jnp.float32),
        ny=jnp.asarray(np.rint(np.fft.fftfreq(M[1]) * M[1]),
                       dtype=jnp.float32),
        nzr=jnp.asarray(np.rint(np.fft.rfftfreq(M[2]) * M[2]),
                        dtype=jnp.float32),
    )


def pme_influence(pp: PMEParams, box):
    """Âhat, mesh spacing, and volume derived from the LIVE box (device
    math, jit-safe) — the NPT path. The mesh SHAPE (grid, m, p, h) stays
    the build-time one: h was sized with `slack` margin, and NPT drivers
    cap box drift at a few percent (tiled/npt.py max_box_drift), so the
    B-spline support stays covered."""
    box = jnp.asarray(box)
    V = box[0] * box[1] * box[2]
    kx = (2.0 * jnp.pi) * pp.nx / box[0]
    ky = (2.0 * jnp.pi) * pp.ny / box[1]
    kz = (2.0 * jnp.pi) * pp.nzr / box[2]
    k2 = ((kx * kx)[:, None, None] + (ky * ky)[None, :, None]
          + (kz * kz)[None, None, :])
    A = jnp.where(k2 > 1e-12,
                  jnp.exp(-k2 / (4.0 * pp.alpha * pp.alpha))
                  / jnp.maximum(k2, 1e-12), 0.0)
    A = A * (units.QQR2E * 2.0 * jnp.pi / V) * pp.binv
    sp = tuple(box[d] / pp.mesh[d] for d in range(3))
    return A.astype(pp.Ahat.dtype), sp, V


def _mp_and_deriv(t, p: int):
    """Branchless M_p(t) and M_p'(t); t clipped to [0, p] so out-of-support
    arguments (parked slots included) give exactly (0, 0)."""
    t = jnp.clip(t, 0.0, float(p))
    mp = jnp.zeros_like(t)
    dmp = jnp.zeros_like(t)
    inv_fac = 1.0 / math.factorial(p - 1)
    for k in range(p + 1):
        c = ((-1.0) ** k) * math.comb(p, k)
        tk = jnp.maximum(t - k, 0.0)
        tkp = tk ** (p - 3)            # shared power
        mp = mp + c * tkp * tk * tk
        dmp = dmp + c * (p - 1) * tkp * tk
    return mp * inv_fac, dmp * inv_fac


def _cell_factors(u, jgrid, d, p):
    """B-spline factors between cell-block mesh indices and atoms.

    u: (gx,gy,gz,A) atom coords in mesh units for dimension d;
    jgrid: (g_d, ext) extended-block mesh indices for that dim;
    d: which of the three cell-grid axes this dimension is.
    Returns (B, dB): (gx,gy,gz, ext, A)."""
    shape = [1, 1, 1, jgrid.shape[1], 1]
    shape[d] = jgrid.shape[0]
    jj = jgrid.reshape(*shape)
    t = u[..., None, :] - jj + p / 2.0
    return _mp_and_deriv(t, p)


def _overlap_add(Qext, g, m, h):
    """(gx,gy,gz,ex,ey,ez) extended blocks → (Mx,My,Mz) mesh (periodic)."""
    out = Qext
    for d in range(3):
        cell_ax, mesh_ax = d, 3 + d
        own = jax.lax.slice_in_dim(out, h[d], h[d] + m[d], axis=mesh_ax)
        tail = jax.lax.slice_in_dim(out, m[d] + h[d], m[d] + 2 * h[d],
                                    axis=mesh_ax)
        head = jax.lax.slice_in_dim(out, 0, h[d], axis=mesh_ax)
        pad_t = [(0, 0)] * out.ndim
        pad_t[mesh_ax] = (0, m[d] - h[d])
        pad_h = [(0, 0)] * out.ndim
        pad_h[mesh_ax] = (m[d] - h[d], 0)
        out = (own
               + jnp.pad(jnp.roll(tail, 1, axis=cell_ax), pad_t)
               + jnp.pad(jnp.roll(head, -1, axis=cell_ax), pad_h))
    # (gx, gy, gz, mx, my, mz) → (gx*mx, gy*my, gz*mz)
    gx, gy, gz = g
    out = out.transpose(0, 3, 1, 4, 2, 5)
    return out.reshape(gx * m[0], gy * m[1], gz * m[2])


def _extract_blocks(mesh, g, m, h):
    """(Mx,My,Mz) mesh → (gx,gy,gz,ex,ey,ez) extended blocks (periodic)."""
    gx, gy, gz = g
    blk = mesh.reshape(gx, m[0], gy, m[1], gz, m[2]).transpose(
        0, 2, 4, 1, 3, 5)
    for d in range(3):
        cell_ax, mesh_ax = d, 3 + d
        prev_tail = jax.lax.slice_in_dim(
            jnp.roll(blk, 1, axis=cell_ax), m[d] - h[d], m[d], axis=mesh_ax)
        next_head = jax.lax.slice_in_dim(
            jnp.roll(blk, -1, axis=cell_ax), 0, h[d], axis=mesh_ax)
        blk = jnp.concatenate([prev_tail, blk, next_head], axis=mesh_ax)
    return blk


_HI = jax.lax.Precision.HIGH


def _solute_factors(s_mod, M, p, dtype):
    """(M_d, Ns) B-spline factors vs the full mesh, with periodic images."""
    j = jnp.arange(M, dtype=dtype)
    t = s_mod[None, :] - j[:, None] + p / 2.0
    b = dmp = 0.0
    for shift in (-float(M), 0.0, float(M)):
        mp_, dmp_ = _mp_and_deriv(t + shift, p)
        b = b + mp_
        dmp = dmp + dmp_
    return b, dmp


def pme_recip_tiled(wxg, wq, sx, qs, pp: PMEParams, *,
                    need_water_phi: bool = False, box=None):
    """Reciprocal + self + background electrostatics on tiles + solute.

    wxg: (3, gx, gy, gz, A) water coords (box-wrapped; parked pads OK);
    wq:  (gx, gy, gz, A) water charges (0 on invalid slots);
    sx:  (Ns, 3) solute coords; qs: (Ns,) masked solute charges.
    `box`: pass the LIVE box (e.g. under an NPT barostat) to derive the
    influence function / spacing / volume from it on device; None uses the
    params' baked build-time box (the zero-overhead NVT fast path).
    Returns (e, fw (3,gx,gy,gz,A), fs (Ns,3), phi_s (Ns,),
    phi_w (gx,gy,gz,A) or None)."""
    g, m, h, p = pp.grid, pp.m, pp.h, pp.p
    gx, gy, gz = g
    dtype = wq.dtype
    M = pp.mesh
    if box is None:
        sp, Ahat, volume, boxv = pp.spacing, pp.Ahat, pp.volume, pp.box
    else:
        Ahat, sp, volume = pme_influence(pp, box)
        boxv = jnp.asarray(box)

    # ---- water spreading: per-cell extended blocks via factor matmuls ----
    Bd, dBd = [], []
    for d in range(3):
        u = wxg[d] / sp[d]
        base = (jnp.arange(g[d], dtype=dtype) * m[d])[:, None]
        jgrid = base + jnp.arange(-h[d], m[d] + h[d], dtype=dtype)[None, :]
        B, dB = _cell_factors(u, jgrid, d, p)
        Bd.append(B)
        dBd.append(dB)
    ex, ey, ez = (m[d] + 2 * h[d] for d in range(3))
    A_at = wq.shape[-1]

    tyz = (Bd[1][..., :, None, :] * Bd[2][..., None, :, :])  # (...,ey,ez,A)
    tyz_q = (tyz * wq[..., None, None, :]).reshape(gx, gy, gz, ey * ez, A_at)
    Qext = jnp.einsum("...ea,...fa->...ef", Bd[0], tyz_q,
                      precision=_HI)                      # (...,ex,ey*ez)
    Qext = Qext.reshape(gx, gy, gz, ex, ey, ez)
    Q = _overlap_add(Qext, g, m, h)

    # ---- solute spreading (dense over the full mesh; Ns is small) ----
    Ns = qs.shape[0]
    sb, sdb = [], []
    for d in range(3):
        s_mod = jnp.mod(sx[:, d], boxv[d]) / sp[d]
        b, db = _solute_factors(s_mod, M[d], p, dtype)
        sb.append(b)
        sdb.append(db)
    tyz_s = (sb[1][:, None, :] * sb[2][None, :, :]).reshape(M[1] * M[2], Ns)
    Qs = jnp.einsum("xa,fa->xf", sb[0] * qs[None, :], tyz_s,
                    precision=_HI).reshape(M[0], M[1], M[2])
    Q = Q + Qs

    # ---- k-space convolution: φ_mesh = ∂E/∂Q = 2·M³·irfftn(Ahat ⊙ Q̂) ----
    Qhat = jnp.fft.rfftn(Q.astype(jnp.float32))
    n_mesh = M[0] * M[1] * M[2]
    phi_mesh = (2.0 * n_mesh) * jnp.fft.irfftn(
        Ahat * Qhat, s=M).astype(dtype)
    e_rec = 0.5 * jnp.sum(Q * phi_mesh)

    # ---- interpolation: forces (+ φ where needed) ----
    blk = _extract_blocks(phi_mesh, g, m, h)              # (...,ex,ey,ez)
    blk2 = blk.reshape(gx, gy, gz, ex, ey * ez)
    V0 = jnp.einsum("...ea,...ef->...af", Bd[0], blk2, precision=_HI)
    V1 = jnp.einsum("...ea,...ef->...af", dBd[0], blk2, precision=_HI)
    V0 = V0.reshape(gx, gy, gz, A_at, ey, ez)
    V1 = V1.reshape(gx, gy, gz, A_at, ey, ez)
    W00 = jnp.einsum("...ya,...ayz->...az", Bd[1], V0)
    W10 = jnp.einsum("...ya,...ayz->...az", Bd[1], V1)
    W01 = jnp.einsum("...ya,...ayz->...az", dBd[1], V0)
    sx_sum = jnp.einsum("...za,...az->...a", Bd[2], W10)
    sy_sum = jnp.einsum("...za,...az->...a", Bd[2], W01)
    sz_sum = jnp.einsum("...za,...az->...a", dBd[2], W00)
    fw = jnp.stack([
        -wq * sx_sum / sp[0],
        -wq * sy_sum / sp[1],
        -wq * sz_sum / sp[2],
    ])
    phi_w = None
    if need_water_phi:
        phi_w = jnp.einsum("...za,...az->...a", Bd[2], W00)

    # solute interpolation
    phi_flat = phi_mesh.reshape(M[0], M[1] * M[2])
    U0 = jnp.einsum("xa,xf->af", sb[0], phi_flat, precision=_HI)
    U1 = jnp.einsum("xa,xf->af", sdb[0], phi_flat, precision=_HI)
    U0 = U0.reshape(Ns, M[1], M[2])
    U1 = U1.reshape(Ns, M[1], M[2])
    R00 = jnp.einsum("ya,ayz->az", sb[1], U0)
    R10 = jnp.einsum("ya,ayz->az", sb[1], U1)
    R01 = jnp.einsum("ya,ayz->az", sdb[1], U0)
    phi_s = jnp.einsum("za,az->a", sb[2], R00)
    fs = jnp.stack([
        -qs * jnp.einsum("za,az->a", sb[2], R10) / sp[0],
        -qs * jnp.einsum("za,az->a", sb[2], R01) / sp[1],
        -qs * jnp.einsum("za,az->a", sdb[2], R00) / sp[2],
    ], axis=-1)

    # ---- self energy + neutralizing background (as in ops.ewald) ----
    C = units.QQR2E
    qsum = jnp.sum(wq) + jnp.sum(qs)
    q2sum = jnp.sum(wq * wq) + jnp.sum(qs * qs)
    e_self = -C * pp.alpha / _SQRT_PI * q2sum
    e_bg = -C * jnp.pi / (2.0 * pp.alpha**2 * volume) * qsum * qsum
    corr = (-2.0 * C * pp.alpha / _SQRT_PI,
            -C * jnp.pi / (pp.alpha**2 * volume) * qsum)
    phi_s = phi_s + corr[0] * qs + corr[1]
    if need_water_phi:
        phi_w = phi_w + corr[0] * wq + corr[1]

    return e_rec + e_self + e_bg, fw, fs, phi_s, phi_w
