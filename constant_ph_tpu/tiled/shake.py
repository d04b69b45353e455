"""SHAKE/RATTLE on tile-resident rigid water — fully regular (no gathers).

Water tiles are (3dims, G, 3W) with molecules in consecutive slot triples,
so reshaping to (G·W, 3atoms, 3dims) molecule batches is free and the
M-SHAKE / M-RATTLE cores from ops.constraints apply directly. Invalid
(padded) molecule slots are masked after the solve.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from constant_ph_tpu.ops.constraints import _C, mrattle_dv, mshake_delta
from constant_ph_tpu.state import min_image
from constant_ph_tpu.tiled.layout import TileParams, WaterModel


class TiledWaterShake:
    def __init__(self, wm: WaterModel, p: TileParams, n_newton: int = 10):
        self.p = p
        self.n_newton = n_newton
        inv_m = 1.0 / np.array(wm.mass_pattern)
        self.inv_m = jnp.asarray(inv_m[None, :], dtype=jnp.float32)  # (1,3)
        self.W3 = jnp.asarray(
            np.einsum("ct,dt,t->cd", _C, _C, inv_m)[None], dtype=jnp.float32
        )                                                            # (1,3,3)
        self.Cmat = jnp.asarray(_C, dtype=jnp.float32)
        self.d2 = np.array([wm.d_OH**2, wm.d_OH**2, wm.d_HH**2])

    def _to_mol(self, w):
        """(3, G, 3W) → (G·W, 3atoms, 3dims)"""
        G = self.p.G
        W = self.p.W
        return w.reshape(3, G, W, 3).transpose(1, 2, 3, 0).reshape(G * W, 3, 3)

    def _from_mol(self, m):
        G = self.p.G
        W = self.p.W
        return (m.reshape(G, W, 3, 3).transpose(3, 0, 1, 2)
                .reshape(3, G, 3 * W))

    def positions(self, wx_ref, wx, wv, box, dt, wvalid):
        dtype = wx.dtype
        vm_mol = wvalid.reshape(-1)[:, None, None] > 0.5     # (G·W,1,1)
        xm0 = self._to_mol(wx)
        xr0 = self._to_mol(wx_ref)
        # unwrap satellites into the O image (molecules straddle PBC seams)
        center = xm0[:, :1, :]
        xm0 = center + min_image(xm0 - center, box)
        center_r = xr0[:, :1, :]
        xr0 = center_r + min_image(xr0 - center_r, box)
        delta = mshake_delta(
            xm0, xr0, self.inv_m.astype(dtype), self.W3.astype(dtype),
            self.Cmat.astype(dtype), jnp.asarray(self.d2, dtype=dtype),
            self.n_newton,
        )
        delta = jnp.where(vm_mol, delta, 0.0)
        return (wx + self._from_mol(delta),
                wv + self._from_mol(delta / dt))

    def velocities(self, wx, wv, box, wvalid):
        dtype = wx.dtype
        vm_mol = wvalid.reshape(-1)[:, None, None] > 0.5
        xm = self._to_mol(wx)
        center = xm[:, :1, :]
        xm = center + min_image(xm - center, box)
        vmm = self._to_mol(wv)
        dv = mrattle_dv(xm, vmm, self.inv_m.astype(dtype),
                        self.W3.astype(dtype), self.Cmat.astype(dtype))
        dv = jnp.where(vm_mol, dv, 0.0)
        return wv + self._from_mol(dv)
