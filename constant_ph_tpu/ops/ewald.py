"""Reciprocal-space electrostatics: MXU-native factorized Ewald.

The reference consumes a KSpace solver through per-atom energy tallies
(force->kspace->eatom, fix_constant_pH.cpp:241-244) and needs its dU/dλ
contribution (SURVEY.md §7.3 hard-part 1: "dU/dλ through the full
electrostatics path"). TPU-native design choice (SURVEY.md §2.3.13):
instead of translating PPPM's charge-spreading scatter + FFT (scatter is
the op TPUs hate most), the structure factor is factorized per dimension,

    S(k) = Σ_i q_i e^{ik·r} = Σ_i q_i Ex[i,nx] Ey[i,ny] Ez[i,nz],

and every contraction becomes a tall-skinny MATMUL on the MXU:
T1 = Ey⊙Ez gathered to (N, My·Mz), then S = (q·Ex)ᵀ @ T1, and energy /
force / φ all reduce to (N, My·Mz) @ (My·Mz, Mx) products. Accuracy is the
classic Ewald tradeoff (α, real cutoff, k-cutoff); everything is exactly
differentiable, so φ = ∂U/∂q (the dU/dλ backbone) is analytic and cheap.

Conventions: U_rec = (2π/V)·C Σ_{k≠0} e^{−k²/4α²}/k² |S(k)|² with
C = QQR2E; the k sum runs over the full integer cube (both ±k), masked to
a sphere. Self energy −C·α/√π Σq² and the neutralizing-background term
−C·π/(2α²V)(Σq)² are included here; the real-space erfc part and the
excluded-pair erf compensation live in ops.pair (pp.alpha > 0).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units

_SQRT_PI = 1.7724538509055159


@struct.dataclass
class EwaldParams:
    alpha: float = struct.field(pytree_node=False)
    nmax: tuple = struct.field(pytree_node=False)     # (nx, ny, nz) max index
    kx: jax.Array      # (Mx,) 2π n / Lx
    ky: jax.Array      # (My,)
    kz: jax.Array      # (Mz,)
    A: jax.Array       # (Mx, My*Mz) prefactor C·(2π/V)·e^{−k²/4α²}/k², 0-masked
    ky_idx: jax.Array  # (My*Mz,) int32 — index maps for the fused yz axis
    kz_idx: jax.Array  # (My*Mz,)
    volume: float = struct.field(pytree_node=False)


def suggest_alpha(cutoff: float, accuracy: float = 1e-4) -> float:
    """Ewald splitting α from the real-space cutoff and force accuracy
    (erfc(α·rc) ≈ accuracy — the LAMMPS-style heuristic)."""
    s = 1.0
    while np.exp(-s * s) / (s * s) > accuracy and s < 10:
        s += 0.01
    return s / cutoff


def make_ewald_params(
    box, alpha: float, *, accuracy: float = 1e-4, kmax: int | None = None,
    dtype=jnp.float32,
) -> EwaldParams:
    """Host-side precomputation of the k-grid for a fixed box."""
    box = np.asarray(box, dtype=np.float64)
    V = float(np.prod(box))
    if kmax is None:
        # e^{−k²/4α²}/ (k²/4α²) ≈ accuracy  →  k_cut ≈ 2·α·s
        s = 1.0
        while np.exp(-s * s) / (s * s) > accuracy and s < 10:
            s += 0.01
        k_cut = 2.0 * alpha * s
        nmax = tuple(int(np.ceil(k_cut * L / (2 * np.pi))) for L in box)
    else:
        nmax = (kmax, kmax, kmax)
        k_cut = 2 * np.pi * kmax / box.min()

    # hermitian half space: S(−k) = conj(S(k)), so the full-cube sum equals
    # the half-space sum with doubled weights. All downstream formulas are
    # linear in the prefactor A, so the weights are absorbed into A and the
    # kx range shrinks to [0, nmax] — ~2× fewer phases and matmul columns.
    ns = [np.arange(0, nmax[0] + 1),
          np.arange(-nmax[1], nmax[1] + 1),
          np.arange(-nmax[2], nmax[2] + 1)]
    kx = 2 * np.pi * ns[0] / box[0]
    ky = 2 * np.pi * ns[1] / box[1]
    kz = 2 * np.pi * ns[2] / box[2]
    KX, KY, KZ = np.meshgrid(kx, ky, kz, indexing="ij")
    NX, NY, NZ = np.meshgrid(ns[0], ns[1], ns[2], indexing="ij")
    k2 = KX**2 + KY**2 + KZ**2
    mask = (k2 > 1e-12) & (np.sqrt(k2) <= k_cut + 1e-12)
    # keep exactly one of each ±k pair: nx>0 fully; on the nx=0 plane keep
    # ny>0 plus the (ny=0, nz>0) half-line — each with weight 2
    half = (NX > 0) | ((NX == 0) & (NY > 0)) \
        | ((NX == 0) & (NY == 0) & (NZ > 0))
    mask &= half
    with np.errstate(divide="ignore", invalid="ignore"):
        A = np.where(mask, 2.0 * np.exp(-k2 / (4 * alpha * alpha)) / k2, 0.0)
    A *= units.QQR2E * 2.0 * np.pi / V

    My, Mz = len(ky), len(kz)
    yz_y, yz_z = np.meshgrid(np.arange(My), np.arange(Mz), indexing="ij")
    return EwaldParams(
        alpha=float(alpha),
        nmax=nmax,
        kx=jnp.asarray(kx, dtype=dtype),
        ky=jnp.asarray(ky, dtype=dtype),
        kz=jnp.asarray(kz, dtype=dtype),
        A=jnp.asarray(A.reshape(len(kx), My * Mz), dtype=dtype),
        ky_idx=jnp.asarray(yz_y.reshape(-1), dtype=jnp.int32),
        kz_idx=jnp.asarray(yz_z.reshape(-1), dtype=jnp.int32),
        volume=V,
    )


def _phase_tables_xd(xd, ep: EwaldParams):
    """Per-dimension complex phase tables from a tuple of (M,) coords."""
    out = []
    for d, k in enumerate((ep.kx, ep.ky, ep.kz)):
        ang = xd[d][:, None] * k[None, :]                         # (M, Md)
        out.append((jnp.cos(ang), jnp.sin(ang)))
    return out


def ewald_recip(x, q, ep: EwaldParams):
    """Reciprocal + self + background energy, forces, φ=∂U/∂q, per-atom tally.

    Returns (E, F(N,3), phi(N,), eatom(N,)).
    """
    xd = tuple(
        jax.lax.index_in_dim(x, d, axis=1, keepdims=False) for d in range(3)
    )
    e, (fx, fy, fz), phi, eatom = ewald_recip_xd(xd, q, ep)
    force = jnp.stack([fx, fy, fz], axis=-1)
    return e, force, phi, eatom


def ewald_recip_xd(xd, q, ep: EwaldParams):
    """Same as ewald_recip but on a tuple of 3 per-dim (M,) coordinate
    arrays (the layout the tiled path uses). Returns per-dim force tuple."""
    dtype = q.dtype
    (exr, exi), (eyr, eyi), (ezr, ezi) = _phase_tables_xd(xd, ep)

    # fused yz phase table T1 = Ey ⊙ Ez via broadcast outer products —
    # per-element column gathers are pathologically slow on TPU
    n = q.shape[0]
    My = eyr.shape[1]
    Mz = ezr.shape[1]
    t1r = (eyr[:, :, None] * ezr[:, None, :]
           - eyi[:, :, None] * ezi[:, None, :]).reshape(n, My * Mz)
    t1i = (eyr[:, :, None] * ezi[:, None, :]
           + eyi[:, :, None] * ezr[:, None, :]).reshape(n, My * Mz)

    # S[nx, yz] = Σ_i q_i Ex[i,nx] T1[i,yz]   (4 real MXU matmuls)
    qexr = q[:, None] * exr
    qexi = q[:, None] * exi
    # TPU matmuls default to one bf16 pass — far too coarse for forces.
    # HIGH (3-pass bf16 synthesis, ~f32 fidelity) doubles throughput vs
    # HIGHEST (6-pass) at no measurable accuracy cost for MD forces.
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGH
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=hi,
    )
    # stack the Mx-side operands so each big (N, MyMz) array is read once
    # per matmul instead of once per pass — the recip path is HBM-bound on
    # these reads, not MXU-bound
    Mx = exr.shape[1]
    qex = jnp.concatenate([qexr, qexi], axis=1)          # (N, 2Mx)
    sr_si_r = mm(qex, t1r)                               # (2Mx, MyMz)
    sr_si_i = mm(qex, t1i)
    sr = sr_si_r[:Mx] - sr_si_i[Mx:]
    si = sr_si_i[:Mx] + sr_si_r[Mx:]

    A = ep.A
    e_rec = jnp.sum(A * (sr * sr + si * si))

    # G = A·conj(S); weighted variants fold in k_y/k_z; k_x folds into the
    # Ex contraction afterwards (it depends only on nx).
    ky_yz = jnp.repeat(ep.ky, Mz)           # (MyMz,) — ij meshgrid order
    kz_yz = jnp.tile(ep.kz, My)
    mmT = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        precision=hi,
    )  # (N, MyMz) @ (Mx, MyMz)^T -> (N, Mx)

    gr0, gi0 = A * sr, -(A * si)            # A·conj(S)
    # all six G variants in one stacked operand: (6Mx, MyMz)
    Gs = jnp.concatenate([
        gr0, gi0,
        ky_yz[None, :] * gr0, ky_yz[None, :] * gi0,
        kz_yz[None, :] * gr0, kz_yz[None, :] * gi0,
    ], axis=0)
    R = mmT(t1r, Gs)                        # (N, 6Mx)
    I = mmT(t1i, Gs)

    def w_pair(s):
        wr = R[:, s * Mx:(s + 1) * Mx] - I[:, (s + 1) * Mx:(s + 2) * Mx]
        wi = I[:, s * Mx:(s + 1) * Mx] + R[:, (s + 1) * Mx:(s + 2) * Mx]
        return wr, wi

    w0r, w0i = w_pair(0)
    # P = Ex·T1; Re[conj(S)·A·P] summed over k → φ/2
    phi = 2.0 * jnp.sum(exr * w0r - exi * w0i, axis=1)

    # forces: F_d = 2 q Σ_k A·k_d·Im[conj(S)·P]
    fx = 2.0 * q * jnp.sum(ep.kx[None, :] * (exr * w0i + exi * w0r), axis=1)
    wyr, wyi = w_pair(2)
    fy = 2.0 * q * jnp.sum(exr * wyi + exi * wyr, axis=1)
    wzr, wzi = w_pair(4)
    fz = 2.0 * q * jnp.sum(exr * wzi + exi * wzr, axis=1)

    # self energy + neutralizing background
    C = units.QQR2E
    qsum = jnp.sum(q)
    e_self = -C * ep.alpha / _SQRT_PI * jnp.sum(q * q)
    e_bg = -C * jnp.pi / (2.0 * ep.alpha**2 * ep.volume) * qsum * qsum
    phi = phi - 2.0 * C * ep.alpha / _SQRT_PI * q \
        - C * jnp.pi / (ep.alpha**2 * ep.volume) * qsum

    e_total = e_rec + e_self + e_bg
    eatom = 0.5 * q * phi
    return (
        e_total,
        (fx.astype(dtype), fy.astype(dtype), fz.astype(dtype)),
        phi.astype(dtype),
        eatom.astype(dtype),
    )


def make_kspace_fn(ep: EwaldParams):
    """Engine hook: (x, q, box) -> (E, F, phi, eatom). Box is fixed at
    params-build time (NVT); NPT would re-derive ep from the live box."""
    def fn(x, q, box):
        return ewald_recip(x, q, ep)
    return fn
