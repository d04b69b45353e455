"""Holonomic constraints: M-SHAKE / M-RATTLE for rigid triatomics.

Rigid SPC/E water is the work-horse solvent of the BASELINE configs; the
reference delegates constraints to its host engine (SURVEY.md §2.3.12).
TPU-native shape: all M water molecules are constrained in parallel with
batched 3×3 linear solves — M-RATTLE velocity projection is a single exact
solve, and M-SHAKE positions are a fixed small number of Newton iterations
(static trip count, no data-dependent control flow). Molecules are disjoint,
so everything is embarrassingly parallel (M, 3, 3) tensor algebra.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu.state import min_image

# constraint incidence matrix: rows = constraints (0-1, 0-2, 1-2),
# cols = atoms; J_c x = Σ_t C[c,t] x_t is the bond vector of constraint c.
_C = np.array([[1.0, -1.0, 0.0],
               [1.0, 0.0, -1.0],
               [0.0, 1.0, -1.0]])


def solve3_components(a00, a01, a02, a10, a11, a12, a20, a21, a22,
                      b0, b1, b2):
    """Cramer 3×3 solve on component arrays (any broadcastable shape) —
    pure VPU elementwise math. Shared by the (...,3,3) wrapper below and
    the lane-native tiled SHAKE (tiled/shake.py)."""
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    # degenerate system (violently distorted molecule): return zero update
    # instead of a huge one — the caller's next iteration/step recovers
    inv_det = jnp.where(jnp.abs(det) > 1e-6, 1.0 / det, 0.0)
    x0 = (b0 * c00 + b1 * (a02 * a21 - a01 * a22)
          + b2 * (a01 * a12 - a02 * a11)) * inv_det
    x1 = (b0 * c01 + b1 * (a00 * a22 - a02 * a20)
          + b2 * (a02 * a10 - a00 * a12)) * inv_det
    x2 = (b0 * c02 + b1 * (a01 * a20 - a00 * a21)
          + b2 * (a00 * a11 - a01 * a10)) * inv_det
    return x0, x1, x2


def _solve3(A, b):
    """Batched 3×3 solve via Cramer's rule (jnp.linalg.solve's
    LAPACK-style path is a poor fit for TPU kernels).

    A: (..., 3, 3), b: (..., 3) → (..., 3).
    """
    x0, x1, x2 = solve3_components(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 0], A[..., 1, 1], A[..., 1, 2],
        A[..., 2, 0], A[..., 2, 1], A[..., 2, 2],
        b[..., 0], b[..., 1], b[..., 2])
    return jnp.stack([x0, x1, x2], axis=-1)


# NOTE: these cores deliberately avoid einsum/matmul — TPU matmuls run at
# bf16 precision by default, which breaks SHAKE convergence (measured ~5e-3
# error per contraction). The incidence matrix C is ±1/0, so everything is
# plain differences and elementwise products (exact f32 on the VPU).


def _bond_vectors(xm):
    """(M,3atoms,3) → (M,3constraints,3): rows (0-1, 0-2, 1-2) of _C."""
    return jnp.stack(
        [xm[..., 0, :] - xm[..., 1, :],
         xm[..., 0, :] - xm[..., 2, :],
         xm[..., 1, :] - xm[..., 2, :]], axis=-2)


def _gram(a, b):
    """A[m,c,d] = Σ_x a[m,c,x]·b[m,d,x] without MXU (exact f32)."""
    return jnp.sum(a[..., :, None, :] * b[..., None, :, :], axis=-1)


def _apply_ct(k, s, inv_m):
    """dx[m,t,x] = (1/m_t) Σ_c k_c C[c,t] s[m,c,x] with C = ±1/0 rows."""
    k0 = k[..., 0:1]
    k1 = k[..., 1:2]
    k2 = k[..., 2:3]
    dx0 = k0 * s[..., 0, :] + k1 * s[..., 1, :]
    dx1 = -k0 * s[..., 0, :] + k2 * s[..., 2, :]
    dx2 = -k1 * s[..., 1, :] - k2 * s[..., 2, :]
    return inv_m[..., None] * jnp.stack([dx0, dx1, dx2], axis=-2)


def mshake_delta(xm0, xr, inv_m, W, C, d2, n_newton):
    """M-SHAKE core: displacement that puts (M,3,3) molecule coords onto
    the constraint manifold along reference bond directions."""
    s_ref = _bond_vectors(xr)

    def newton(_, xm):
        s = _bond_vectors(xm)
        g = 0.5 * (jnp.sum(s * s, axis=-1) - d2)
        A = W * _gram(s, s_ref)
        k = _solve3(A, -g)
        dx = _apply_ct(k, s_ref, inv_m)
        # trust region: a near-singular geometry must not catapult atoms
        norm = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True) + 1e-20)
        dx = dx * jnp.minimum(1.0, 0.5 / norm)
        return xm + dx

    xm = jax.lax.fori_loop(0, n_newton, newton, xm0)
    return xm - xm0


def mrattle_dv(xm, vm, inv_m, W, C):
    """M-RATTLE core: velocity change removing constraint-direction
    components for (M,3,3) molecules."""
    s = _bond_vectors(xm)
    sv = _bond_vectors(vm)
    jv = jnp.sum(s * sv, axis=-1)
    A = W * _gram(s, s)
    k = _solve3(A, -jv)
    return _apply_ct(k, s, inv_m)


class RigidTriatomic:
    """Constraints for M identical triatomic molecules.

    triplets: (M, 3) atom indices (center, satellite1, satellite2) —
    e.g. (O, H1, H2). Constraints: |r01| = d01, |r02| = d01, |r12| = d12.
    """

    def __init__(self, triplets, masses, d01: float, d12: float,
                 *, n_newton: int = 6):
        self.triplets = jnp.asarray(np.asarray(triplets, dtype=np.int32))
        self.d2 = np.array([d01 * d01, d01 * d01, d12 * d12])
        self.n_newton = n_newton
        m = np.asarray(masses)[np.asarray(triplets)]       # (M, 3)
        inv_m = 1.0 / m
        # W[c',c] = Σ_t C[c',t] C[c,t] / m_t  — per-molecule (3, 3)
        self.W = jnp.asarray(
            np.einsum("ct,dt,mt->mcd", _C, _C, inv_m), dtype=jnp.float32
        )
        self.inv_m = jnp.asarray(inv_m, dtype=jnp.float32)  # (M, 3)
        self.Cmat = jnp.asarray(_C, dtype=jnp.float32)

    @property
    def n_constraints(self) -> int:
        return 3 * self.triplets.shape[0]

    def _gather_local(self, x, box):
        """Molecule positions unwrapped into the center atom's image."""
        xm = x[self.triplets]                 # (M, 3, 3)
        center = xm[:, :1, :]
        return center + min_image(xm - center, box)

    def positions(self, x_ref, x, v, box, dt):
        """M-SHAKE: Newton iterations with exact 3×3 solves; moves x onto
        the constraint manifold along the reference bond directions and
        adds the displacement/dt to v (standard SHAKE velocity bookkeeping).
        """
        dtype = x.dtype
        C = self.Cmat.astype(dtype)
        W = self.W.astype(dtype)
        inv_m = self.inv_m.astype(dtype)
        d2 = jnp.asarray(self.d2, dtype=dtype)

        xm0 = self._gather_local(x, box)      # (M, 3atoms, 3xyz)
        xr = self._gather_local(x_ref, box)
        delta = mshake_delta(xm0, xr, inv_m, W, C, d2, self.n_newton)
        flat = self.triplets.reshape(-1)
        x = x.at[flat].add(delta.reshape(-1, 3))
        v = v.at[flat].add(delta.reshape(-1, 3) / dt)
        return x, v

    def velocities(self, x, v, box):
        """M-RATTLE: one exact 3×3 solve removes all velocity components
        along constraint directions."""
        dtype = x.dtype
        C = self.Cmat.astype(dtype)
        W = self.W.astype(dtype)
        inv_m = self.inv_m.astype(dtype)

        xm = self._gather_local(x, box)
        vm = v[self.triplets]                      # (M, 3, 3)
        dv = mrattle_dv(xm, vm, inv_m, W, C)
        flat = self.triplets.reshape(-1)
        return v.at[flat].add(dv.reshape(-1, 3))
