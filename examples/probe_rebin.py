"""A/B probe: argsort+row-gather rebin (current) vs a multi-operand
lax.sort rebin that moves the 18-wide molecule rows through the bitonic
sort network itself (no separate gather).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.layout import (
    PARK_BASE, PARK_SPACING, rebin, split_system, to_tiled,
)

K = 30


def rebin_sortnet(tstate, p):
    """lax.sort variant: key + 18 payload columns sorted together."""
    G, W = p.G, p.W
    dtype = tstate.wx.dtype
    grid = jnp.array(p.grid, dtype=jnp.int32)
    gx, gy, gz = p.grid
    box = tstate.box

    xm = tstate.wx.reshape(3, G, W, 3).transpose(1, 2, 0, 3).reshape(G * W, 9)
    vm = tstate.wv.reshape(3, G, W, 3).transpose(1, 2, 0, 3).reshape(G * W, 9)
    valid = tstate.wvalid.reshape(G * W)
    wid = tstate.wid.reshape(G * W)

    o_only = xm[:, ::3]
    mol = xm.reshape(-1, 3, 3)
    rel = mol - o_only[:, :, None]
    rel = rel - box[None, :, None] * jnp.round(rel / box[None, :, None])
    o_pos = o_only + jnp.mean(rel, axis=2)
    img = box[None, :] * jnp.floor(o_pos / box[None, :])
    ow = o_pos - img
    xm = xm - jnp.repeat(img, 3, axis=1)
    cell = (box / jnp.asarray(p.grid, dtype=dtype))[None, :]
    ci = jnp.clip((ow / cell).astype(jnp.int32), 0, grid[None, :] - 1)
    cid = (ci[:, 0] * gy + ci[:, 1]) * gz + ci[:, 2]
    key = jnp.where(valid > 0.5, cid, G)

    ops = (key,) + tuple(xm[:, i] for i in range(9)) \
        + tuple(vm[:, i] for i in range(9)) + (wid,)
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    key_s = sorted_ops[0]
    rows_s = jnp.stack(sorted_ops[1:19], axis=1)            # (G*W, 18)
    wid_s = sorted_ops[19]

    first = jnp.searchsorted(key_s, key_s, side="left")
    rank = jnp.arange(G * W, dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.any((rank >= W) & (key_s < G))
    slot = jnp.clip(rank, 0, W - 1)
    dest = jnp.where(key_s < G, key_s * W + slot, G * W)

    park = (PARK_BASE + PARK_SPACING * jnp.arange(G * W, dtype=dtype))[:, None]
    park_rows = jnp.concatenate(
        [jnp.broadcast_to(park, (G * W, 9)), jnp.zeros((G * W, 9), dtype)],
        axis=1)
    new_rows = park_rows.at[dest].set(rows_s, mode="drop")
    new_valid = jnp.zeros(G * W, dtype).at[dest].set(1.0, mode="drop")
    new_wid = jnp.full_like(wid_s, -1).at[dest].set(wid_s, mode="drop")

    xm2 = new_rows[:, :9].reshape(G, W, 3, 3).transpose(2, 0, 1, 3)
    vm2 = new_rows[:, 9:].reshape(G, W, 3, 3).transpose(2, 0, 1, 3)
    new = tstate.replace(
        wx=xm2.reshape(3, G, 3 * W), wv=vm2.reshape(3, G, 3 * W),
        wvalid=new_valid.reshape(G, W), wid=new_wid.reshape(G, W),
    )
    return new, overflow


def main():
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=20, rigid_water=True, lambda_coupled=True,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
            hmr=3.0,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.45)
        tst = to_tiled(ts, sys_.state)
    p = ts.params
    tst = jax.device_put(tst, jax.devices()[0])

    # parity
    a, _ = jax.jit(lambda s: rebin(s, p))(tst)
    b, _ = jax.jit(lambda s: rebin_sortnet(s, p))(tst)
    np.testing.assert_allclose(np.sort(np.asarray(a.wx), axis=None),
                               np.sort(np.asarray(b.wx), axis=None),
                               atol=1e-6)
    print("parity OK (same multiset of coordinates)")

    def scan_time(fn, st, k):
        @jax.jit
        def run(st):
            def f(carry, _):
                s, acc = carry
                s2, ov = fn(s, p)
                return (s2, acc + jnp.sum(s2.wx[0, 0, :4])), None
            (s_f, acc), _ = jax.lax.scan(f, (st, jnp.zeros(())), None,
                                         length=k)
            return acc
        float(run(st))
        t0 = time.perf_counter()
        float(run(st))
        return time.perf_counter() - t0

    for name, fn in (("argsort+gather", rebin), ("lax.sort rows", rebin_sortnet)):
        t1 = scan_time(fn, tst, K)
        t2 = scan_time(fn, tst, 2 * K)
        print(f"{name:16s} {(t2 - t1) / K * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
