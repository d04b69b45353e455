"""Probe: where does the PME reciprocal step's time go on the v5e?

Times the three stages of ops/pme.pme_recip_tiled separately (spreading
matmuls, FFT convolution, interpolation) by replicating the staged
computation, plus the full call and the full engine step — optimization
targeting for VERDICT item 3 (PME headline).
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.ops import pme as pme_mod
from constant_ph_tpu.ops.pme import make_pme_params, pme_recip_tiled
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(n_side=20, rigid_water=True, lambda_coupled=True,
                             cutoff=8.0, skin=0.8, coul_style="cut",
                             alpha=0.30, pH=5.0, hmr=3.0)
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    pp = make_pme_params(np.asarray(sys_.state.box), ts.params.grid, 0.30,
                         spacing=1.5, p=6, skin=0.8)
    log(f"mesh {pp.mesh} m={pp.m} h={pp.h} p={pp.p}")

    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=pp)
    tst, _ = jax.jit(eng_eq.make_minimize(300))(tst)
    tst, ov, obs = jax.jit(eng_eq.make_run(400))(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ)
    tst = jax.device_put(tst, dev)
    log(f"equilibrated W={ts.params.W}")

    g, m, h, p = pp.grid, pp.m, pp.h, pp.p
    gx, gy, gz = g
    W = ts.params.W
    A = 3 * W
    M = pp.mesh
    sp = pp.spacing
    wq_pat = jnp.asarray(np.tile(ts.water.q_pattern, W), jnp.float32)
    vm = jnp.repeat(tst.wvalid, 3, axis=-1)
    wqg = (wq_pat[None, :] * vm).reshape(gx, gy, gz, A)
    wxg = tst.wx.reshape(3, gx, gy, gz, A)
    qs = ts.solute.q0 * ts.solute.smask
    sx = tst.sx

    # ---- staged replicas of pme_recip_tiled internals ----
    def bfactors(wxg):
        Bd, dBd = [], []
        for d in range(3):
            u = wxg[d] / sp[d]
            base = (jnp.arange(g[d], dtype=jnp.float32) * m[d])[:, None]
            jgrid = base + jnp.arange(-h[d], m[d] + h[d],
                                      dtype=jnp.float32)[None, :]
            B, dB = pme_mod._cell_factors(u, jgrid, d, p)
            Bd.append(B)
            dBd.append(dB)
        return Bd, dBd

    def spread(wxg, wqg):
        Bd, _ = bfactors(wxg)
        ex, ey, ez = (m[d] + 2 * h[d] for d in range(3))
        tyz = (Bd[1][..., :, None, :] * Bd[2][..., None, :, :])
        tyz_q = (tyz * wqg[..., None, None, :]).reshape(
            gx, gy, gz, ey * ez, A)
        Qext = jnp.einsum("...ea,...fa->...ef", Bd[0], tyz_q,
                          precision=pme_mod._HI)
        Qext = Qext.reshape(gx, gy, gz, ex, ey, ez)
        return pme_mod._overlap_add(Qext, g, m, h)

    def conv(Q):
        Qhat = jnp.fft.rfftn(Q.astype(jnp.float32))
        n_mesh = M[0] * M[1] * M[2]
        return (2.0 * n_mesh) * jnp.fft.irfftn(pp.Ahat * Qhat, s=M)

    def interp(wxg, wqg, phi_mesh):
        Bd, dBd = bfactors(wxg)
        ex, ey, ez = (m[d] + 2 * h[d] for d in range(3))
        blk = pme_mod._extract_blocks(phi_mesh, g, m, h)
        blk2 = blk.reshape(gx, gy, gz, ex, ey * ez)
        V0 = jnp.einsum("...ea,...ef->...af", Bd[0], blk2,
                        precision=pme_mod._HI)
        V1 = jnp.einsum("...ea,...ef->...af", dBd[0], blk2,
                        precision=pme_mod._HI)
        V0 = V0.reshape(gx, gy, gz, A, ey, ez)
        V1 = V1.reshape(gx, gy, gz, A, ey, ez)
        W00 = jnp.einsum("...ya,...ayz->...az", Bd[1], V0)
        W10 = jnp.einsum("...ya,...ayz->...az", Bd[1], V1)
        W01 = jnp.einsum("...ya,...ayz->...az", dBd[1], V0)
        sx_s = jnp.einsum("...za,...az->...a", Bd[2], W10)
        sy_s = jnp.einsum("...za,...az->...a", Bd[2], W01)
        sz_s = jnp.einsum("...za,...az->...a", dBd[2], W00)
        return jnp.stack([-wqg * sx_s / sp[0], -wqg * sy_s / sp[1],
                          -wqg * sz_s / sp[2]])

    jb = jax.jit(lambda w: bfactors(w)[0])
    js = jax.jit(spread)
    jc = jax.jit(conv)
    ji = jax.jit(interp)
    jfull = jax.jit(lambda a, b, c, d_: pme_recip_tiled(a, b, c, d_, pp))

    Q = js(wxg, wqg)
    phi_mesh = jc(Q)
    t_b = timeit(jb, wxg)
    t_s = timeit(js, wxg, wqg)
    t_c = timeit(jc, Q)
    t_i = timeit(ji, wxg, wqg, phi_mesh)
    t_f = timeit(jfull, wxg, wqg, sx, qs)
    log(f"bfactors-only: {t_b:.3f} ms")
    log(f"spread (incl bfactors): {t_s:.3f} ms")
    log(f"fft conv: {t_c:.3f} ms")
    log(f"interp (incl bfactors): {t_i:.3f} ms")
    log(f"full pme_recip_tiled: {t_f:.3f} ms")

    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", rebuild_every=12)
    eng = TiledEngine(ts, cfg, kspace_ep=pp)
    run = jax.jit(eng.make_run(12))
    tst2, ov, obs = run(tst)
    tst2, ov, obs = run(tst2)
    t0 = time.perf_counter()
    for _ in range(20):
        tst2, ov, obs = run(tst2)
    jax.block_until_ready(obs.temp)
    ms = (time.perf_counter() - t0) / (20 * 12) * 1e3
    log(f"full PME step: {ms:.3f} ms")
    eng_d = TiledEngine(ts, cfg)
    run_d = jax.jit(eng_d.make_run(12))
    tst2, ov, obs = run_d(tst)
    tst2, ov, obs = run_d(tst2)
    t0 = time.perf_counter()
    for _ in range(20):
        tst2, ov, obs = run_d(tst2)
    jax.block_until_ready(obs.temp)
    ms_d = (time.perf_counter() - t0) / (20 * 12) * 1e3
    log(f"pair-only step (same system, no kspace): {ms_d:.3f} ms")


if __name__ == "__main__":
    main()
