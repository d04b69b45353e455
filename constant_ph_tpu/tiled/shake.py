"""SHAKE/RATTLE on tile-resident rigid water — fully regular (no gathers).

Lane-native formulation: water tiles are (3dims, G, 3W) with molecules in
consecutive slot triples, so per-atom views are strided lane slices
`w[:, :, a::3]` of shape (3, G, W) and every quantity in the solve is a
(G, W) array with molecules on the LANE dim. The earlier (G·W, 3, 3)
molecule-batch form put the trailing 3×3 on the (sublane, lane) tile —
9/1024 slots used; this form keeps the VPU fully occupied.

The constraint math matches ops.constraints (M-SHAKE Newton with the
reference-direction Jacobian, exact M-RATTLE projection, Cramer 3×3
solves); the incidence matrix C is ±1/0 so bond vectors are plain
differences — no matmuls (TPU matmuls default to bf16, which breaks SHAKE
convergence). Invalid (padded) molecule slots are masked after the solve.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from constant_ph_tpu.ops.constraints import _C, solve3_components
from constant_ph_tpu.state import min_image
from constant_ph_tpu.tiled.layout import TileParams, WaterModel


def _dot3(a, b):
    """Σ over the leading dim-3 axis of two (3, G, W) arrays → (G, W)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


class TiledWaterShake:
    def __init__(self, wm: WaterModel, p: TileParams, n_newton: int = 10):
        del p  # layout is implied by the strided slices; kept for API shape
        self.n_newton = n_newton
        inv_m = 1.0 / np.array(wm.mass_pattern)
        self.inv_m = tuple(float(v) for v in inv_m)
        # W3[c,e] = Σ_t C[c,t] C[e,t] / m_t for C rows (0-1, 0-2, 1-2)
        self.W3 = np.einsum("ct,dt,t->cd", _C, _C, inv_m)
        self.d2 = (wm.d_OH ** 2, wm.d_OH ** 2, wm.d_HH ** 2)

    def _atoms(self, w):
        """(3, G, 3W) → three (3, G, W) per-atom views (O, H1, H2)."""
        return w[:, :, 0::3], w[:, :, 1::3], w[:, :, 2::3]

    @staticmethod
    def _merge(a0, a1, a2):
        """three (3, G, W) → (3, G, 3W) with the interleaved slot layout."""
        m = jnp.stack([a0, a1, a2], axis=-1)          # (3, G, W, 3)
        return m.reshape(m.shape[0], m.shape[1], -1)

    def _unwrap(self, w, box):
        """satellites into the O image (molecules straddle PBC seams)."""
        x0, x1, x2 = self._atoms(w)
        b = box.reshape(3, 1, 1)
        return x0, x0 + min_image(x1 - x0, b), x0 + min_image(x2 - x0, b)

    def _bonds(self, x0, x1, x2):
        return x0 - x1, x0 - x2, x1 - x2

    def _solve(self, A_rows, b):
        """k = A⁻¹ b with A[c,e] = W3[c,e]·gram[c,e] given as 9 arrays."""
        return solve3_components(*A_rows, *b)

    def positions(self, wx_ref, wx, wv, box, dt, wvalid):
        im0, im1, im2 = self.inv_m
        W3 = self.W3
        x0, x1, x2 = self._unwrap(wx, box)
        r0, r1, r2 = self._unwrap(wx_ref, box)
        sr0, sr1, sr2 = self._bonds(r0, r1, r2)
        sr = (sr0, sr1, sr2)

        d0 = jnp.zeros_like(x0)
        d1 = jnp.zeros_like(x1)
        d2_ = jnp.zeros_like(x2)
        def clamp(dx):
            # trust region (matches ops.constraints.mshake_delta): a
            # near-singular geometry must not catapult atoms — cap each
            # atom's per-iteration move at 0.5 Å
            norm = jnp.sqrt(_dot3(dx, dx) + 1e-20)[None]
            return dx * jnp.minimum(1.0, 0.5 / norm)

        for _ in range(self.n_newton):
            s0, s1, s2 = self._bonds(x0 + d0, x1 + d1, x2 + d2_)
            s = (s0, s1, s2)
            g = [0.5 * (_dot3(s[c], s[c]) - self.d2[c]) for c in range(3)]
            A = [W3[c, e] * _dot3(s[c], sr[e])
                 for c in range(3) for e in range(3)]
            k0, k1, k2 = self._solve(A, (-g[0], -g[1], -g[2]))
            d0 = d0 + clamp(im0 * (k0 * sr0 + k1 * sr1))
            d1 = d1 + clamp(im1 * (-k0 * sr0 + k2 * sr2))
            d2_ = d2_ + clamp(im2 * (-k1 * sr1 - k2 * sr2))

        vm = (wvalid > 0.5)[None, :, :]
        d0 = jnp.where(vm, d0, 0.0)
        d1 = jnp.where(vm, d1, 0.0)
        d2_ = jnp.where(vm, d2_, 0.0)
        delta = self._merge(d0, d1, d2_)
        return wx + delta, wv + delta / dt

    def velocities(self, wx, wv, box, wvalid):
        im0, im1, im2 = self.inv_m
        W3 = self.W3
        x0, x1, x2 = self._unwrap(wx, box)
        s0, s1, s2 = self._bonds(x0, x1, x2)
        s = (s0, s1, s2)
        v0, v1, v2 = self._atoms(wv)
        sv = self._bonds(v0, v1, v2)
        jv = [_dot3(s[c], sv[c]) for c in range(3)]
        A = [W3[c, e] * _dot3(s[c], s[e])
             for c in range(3) for e in range(3)]
        k0, k1, k2 = self._solve(A, (-jv[0], -jv[1], -jv[2]))
        dv0 = im0 * (k0 * s0 + k1 * s1)
        dv1 = im1 * (-k0 * s0 + k2 * s2)
        dv2 = im2 * (-k1 * s1 - k2 * s2)
        vm = (wvalid > 0.5)[None, :, :]
        dv0 = jnp.where(vm, dv0, 0.0)
        dv1 = jnp.where(vm, dv1, 0.0)
        dv2 = jnp.where(vm, dv2, 0.0)
        return wv + self._merge(dv0, dv1, dv2)
