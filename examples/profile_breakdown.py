"""Per-component timing of the tiled hot path on the real chip.

The axon-tunnel backend gives unreliable `block_until_ready` semantics, so
each component is timed by scanning K data-dependent iterations inside ONE
jit and fetching a scalar; cost/iter = (t(2K) - t(K)) / K. That removes the
tunnel round-trip latency from the measurement.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled import forces as tforces
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import rebin, split_system, to_tiled

K = 20


def scan_time(make_body, tst, k):
    """Build jit(scan(body, K)), return wall seconds for one call."""
    body = make_body()

    @jax.jit
    def run(st):
        def f(carry, _):
            st, acc = carry
            st2, val = body(st)
            return (st2, acc + val), None

        (st_f, acc), _ = jax.lax.scan(f, (st, jnp.zeros(())), None, length=k)
        return acc

    float(run(tst))  # compile + warm
    t0 = time.perf_counter()
    v = float(run(tst))
    t1 = time.perf_counter()
    assert v == v, "nan"
    return t1 - t0


def profile(name, make_body, tst):
    t1 = scan_time(make_body, tst, K)
    t2 = scan_time(make_body, tst, 2 * K)
    print(f"{name:24s} {(t2 - t1) / K * 1e3:8.3f} ms/iter")


def main():
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=20, rigid_water=True, lambda_coupled=True,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
            hmr=3.0,
        )
        # tile_safety 1.45 -> W=60: near the production tiling bench.py
        # reaches after equilibration+retile (W=56) so the breakdown
        # reflects the real step, not the build-time W=76 padding
        ts = split_system(sys_, skin=0.8, tile_safety=1.45)
        tst = to_tiled(ts, sys_.state)
    n_atoms = sys_.state.x.shape[0]
    p = ts.params
    print(f"atoms={n_atoms} grid={p.grid} W={p.W} A={3*p.W} "
          f"G={p.G} stencil={len(p.half_stencil)}")
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)

    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", rebuild_every=8)
    eng = TiledEngine(ts, cfg)

    gx, gy, gz = p.grid
    W = p.W
    style, alpha, rc = ts.coul_style, ts.alpha, ts.cutoff
    eps = 1e-12  # tiny state perturbation to force data dependence

    def mk_ww(pallas=False):
        def body(st):
            wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
            wvg = st.wvalid.reshape(gx, gy, gz, W)
            if pallas:
                from constant_ph_tpu.tiled.pallas_ww import water_water_pallas
                e_lj, e_c, f, eatom, phi = water_water_pallas(
                    wxg, wvg, ts.water, p, st.box,
                    style=style, alpha=alpha, rc=rc)
            else:
                e_lj, e_c, f, eatom, phi = tforces.water_water(
                    wxg, wvg, ts.water, p, st.box,
                    style=style, alpha=alpha, rc=rc)
            fstack = jnp.stack([jnp.reshape(fd, (p.G, 3 * W)) for fd in f])
            st2 = st.replace(wx=st.wx + eps * fstack)
            return st2, e_lj + e_c
        return lambda: body

    def mk_ww_fast():
        def body(st):
            wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
            e_lj, e_c, f = tforces.water_water_fast(
                wxg, ts.water, p, st.box, style=style, alpha=alpha, rc=rc)
            fstack = jnp.stack([jnp.reshape(fd, (p.G, 3 * W)) for fd in f])
            st2 = st.replace(wx=st.wx + eps * fstack)
            return st2, e_lj + e_c
        return lambda: body

    def mk_ws():
        def body(st):
            wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
            wvg = st.wvalid.reshape(gx, gy, gz, W)
            qs = eng.charges_solute(st.lam)
            out = tforces.water_solute(wxg, wvg, st.sx, qs, ts.solute,
                                       ts.water, p, st.box,
                                       style=style, alpha=alpha, rc=rc)
            st2 = st.replace(sx=st.sx + eps * out[3])
            return st2, out[0] + out[1]
        return lambda: body

    def mk_ss():
        def body(st):
            qs = eng.charges_solute(st.lam)
            out = tforces.solute_solute(st.sx, qs, ts.solute, st.box,
                                        style=style, alpha=alpha, rc=rc)
            st2 = st.replace(sx=st.sx + eps * out[2])
            return st2, out[0] + out[1]
        return lambda: body

    def mk_shake():
        def body(st):
            wx, wv = eng.shake.positions(st.wx, st.wx + 1e-6, st.wv, st.box,
                                         cfg.dt, st.wvalid)
            return st.replace(wx=wx, wv=wv), jnp.sum(wx[0, 0, :4])
        return lambda: body

    def mk_forces():
        def body(st):
            frc = eng.compute_forces(st)
            st2 = st.replace(wx=st.wx + eps * frc.fw)
            return st2, frc.e_pot
        return lambda: body

    def mk_step():
        def body(st):
            frc = eng.compute_forces(st)
            st2, frc2 = eng.step(st, frc)
            return st2, frc2.e_pot
        return lambda: body

    def mk_rebin():
        def body(st):
            st2, ov = rebin(st, p)
            return st2, jnp.sum(st2.wx[0, 0, :4])
        return lambda: body

    def mk_shake_vel():
        def body(st):
            wv = eng.shake.velocities(st.wx, st.wv + 1e-9, st.box, st.wvalid)
            return st.replace(wv=wv), jnp.sum(wv[0, 0, :4])
        return lambda: body

    def mk_langevin_rng():
        import jax as _jax

        c1 = jnp.exp(-cfg.gamma * cfg.dt)
        def body(st):
            key, kw, ks_ = _jax.random.split(st.key, 3)
            wv = c1 * st.wv + 1e-3 * _jax.random.normal(
                kw, st.wv.shape, dtype=st.wv.dtype)
            sv = c1 * st.sv + 1e-3 * _jax.random.normal(
                ks_, st.sv.shape, dtype=st.sv.dtype)
            return st.replace(wv=wv, sv=sv, key=key), jnp.sum(wv[0, 0, :4])
        return lambda: body

    profile("ww_xla", mk_ww(False), tst)
    profile("ww_fast", mk_ww_fast(), tst)
    profile("ww_pallas", mk_ww(True), tst)
    profile("water_solute", mk_ws(), tst)
    profile("solute_solute", mk_ss(), tst)
    profile("shake", mk_shake(), tst)
    profile("full_forces", mk_forces(), tst)
    profile("full_step(2x forces)", mk_step(), tst)
    profile("rebin", mk_rebin(), tst)
    profile("shake_velocities", mk_shake_vel(), tst)
    profile("langevin_rng", mk_langevin_rng(), tst)


if __name__ == "__main__":
    main()
