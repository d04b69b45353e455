"""Probe: fair Pallas rematch — water_water_pallas_fast vs the XLA hot
path, like-for-like (same layout, same tricks), on the 24k-atom headline
config. Times both the isolated water-water block and the full MD step.

VERDICT round-1 item 4: the round-1 comparison pitted the full-tally
masked Pallas oracle against the maskless XLA fast path (a strawman);
this probe is the honest measurement.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled import forces as tforces
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled
from constant_ph_tpu.tiled.pallas_ww import water_water_pallas_fast


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def timeit(fn, *args, n=50):
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
                             cutoff=8.0, skin=0.8, coul_style="dsf",
                             alpha=0.2, pH=5.0, hmr=3.0)
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)

    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq)
    tst, _ = jax.jit(eng_eq.make_minimize(300))(tst)
    tst, ov, obs = jax.jit(eng_eq.make_run(400))(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ)
    tst = jax.device_put(tst, dev)
    p = ts.params
    gx, gy, gz = p.grid
    A = 3 * p.W
    log(f"24k atoms, grid {p.grid}, W={p.W} (A={A})")
    wxg = tst.wx.reshape(3, gx, gy, gz, A)

    kw = dict(style=ts.coul_style, alpha=ts.alpha, rc=ts.cutoff)
    f_xla = jax.jit(lambda w: tforces.water_water_fast(w, ts.water, p,
                                                       tst.box, **kw))
    f_pls = jax.jit(lambda w: water_water_pallas_fast(w, ts.water, p,
                                                      tst.box, **kw))
    # numeric parity on the production configuration first
    ex = f_xla(wxg)
    ep = f_pls(wxg)
    de = abs(float(ex[0] - ep[0])) + abs(float(ex[1] - ep[1]))
    fscale = float(jnp.abs(ex[2][0]).max())
    df = max(float(jnp.abs(ex[2][d] - ep[2][d]).max()) for d in range(3))
    log(f"parity: |dE|={de:.2e} max|df|/scale={df / fscale:.2e}")

    t_x = timeit(f_xla, wxg)
    t_p = timeit(f_pls, wxg)
    log(f"water-water block: XLA {t_x:.3f} ms   Pallas {t_p:.3f} ms "
        f"({t_p / t_x:.2f}x)")

    out = {
        "system": "24001-atom solvated acid, rigid SPC/E, DSF rc=8, "
                  f"grid {list(p.grid)}, W={p.W}",
        "parity": {"dE": de, "max_df_rel": df / fscale},
        "block_ms": {"xla": t_x, "pallas_fast": t_p,
                     "ratio_pallas_over_xla": t_p / t_x},
        "full_step": {},
    }
    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", rebuild_every=12)
    for name, flag in (("xla", False), ("pallas-fast", "fast")):
        eng = TiledEngine(ts, cfg, use_pallas_ww=flag)
        run = jax.jit(eng.make_run(12))
        t2, ovv, ob = run(tst)
        t2, ovv, ob = run(t2)
        jax.block_until_ready(ob.temp)
        t0 = time.perf_counter()
        for _ in range(30):
            t2, ovv, ob = run(t2)
        jax.block_until_ready(ob.temp)
        ms = (time.perf_counter() - t0) / (30 * 12) * 1e3
        log(f"full step [{name}]: {ms:.3f} ms/step  {2.0 * 86.4 / ms:.1f} "
            f"ns/day (finite={bool(jnp.isfinite(ob.h_conserved).all())})")
        out["full_step"][name] = {"ms_per_step": ms,
                                  "ns_per_day": 2.0 * 86.4 / ms}
    with open("examples/results/pallas_fast_probe_v5e.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["block_ms"]))


if __name__ == "__main__":
    main()
