"""Long-TI recalibration of dG_ref on the HEWL-scale 16-buffer system.

Why: the round-3 metadynamics titration run revealed a systematic
~-6..-8 kcal/mol residual tilt toward the deprotonated basin across all
20 sites and 8 mature pH walkers (V-table ΔF vs the Henderson-Hasselbalch
expectation, examples/results/metad_multisite_ckpt.npz at chunk 60). The
production dG_ref = -32.18 kcal/mol came from the driver's quick TI
(3 ps/node at dt=1): water reorganization around a charging site spread
over 16 buffer waters is slower than that, which under-converges
<dU/dlam> toward less-negative values and shrinks |dG_ref| — exactly the
observed sign. This script reruns the SAME 7-node Gauss-Legendre TI
protocol with ~2.5x the sampling, starting from a production-relaxed
solvent state (140 ps of metadynamics dynamics), to measure the converged
constant for the next resume.

  PYTHONPATH=/root/repo:$PYTHONPATH python examples/recalibrate_hewl_ti.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    from constant_ph_tpu import titration
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.systems.protein import solvated_polypeptide
    from constant_ph_tpu.tiled.layout import retile, split_system, to_tiled

    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]
    # EXACT build of examples/titration_metad_multisite.py (bufw=16)
    build = dict(n_residues=40, sites_every=2, box_len=66.0,
                 water_spacing=3.1, cutoff=8.0, skin=0.8,
                 coul_style="dsf", alpha=0.2, pH=5.0, dq_scale=1.0,
                 n_buffer_waters=16)
    with jax.default_device(cpu):
        sys_ = solvated_polypeptide(**build)
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)

    ck = np.load("examples/results/metad_multisite_ckpt.npz")
    W = int(ck["W"])
    with jax.default_device(cpu):
        ts, tst = retile(ts, tst, W)
    # adopt replica 0's production-relaxed atoms (same layout, W matches)
    leaves, treedef = jax.tree_util.tree_flatten(tst)
    assert int(ck["n_leaves"]) == len(leaves), "ckpt/layout mismatch"
    new = [jnp.asarray(ck[f"leaf{i}"][0], leaves[i].dtype)
           for i in range(len(leaves))]
    tst = jax.tree_util.tree_unflatten(treedef, new)
    tst = jax.device_put(tst, jax.devices()[0])
    log(f"{sys_.state.x.shape[0]} atoms, W={W}, resumed replica-0 solvent "
        f"({time.time()-t0:.0f}s)")

    # driver's calibration config, 2.5x the sampling (was equil 500/3000)
    cfg_cal = EngineConfig(dt=1.0, thermostat="langevin", T=300.0,
                           gamma=0.01, lambda_thermostat="langevin",
                           rebuild_every=12)
    dG, (nodes, prof) = titration.calibrate_dG_ref_tiled(
        ts, tst, cfg_cal, bias=BiasParams(), site=0,
        equil_steps=800, sample_steps=4000, return_profile=True)
    log(f"LONG TI dG_ref = {dG:.3f} kcal/mol ({time.time()-t0:.0f}s)")
    out = {
        "system": "HEWL-scale 27300-atom polypeptide, 20 sites, "
                  "n_buffer_waters=16, full dq",
        "protocol": "7-node Gauss-Legendre TI, site 0, others lam=0, "
                    "equil 800 + sample 4000 steps/node at dt=1 fs, "
                    "start = replica-0 state of metad_multisite ckpt "
                    "(~140 ps relaxed)",
        "dG_ref_long": dG,
        "dG_ref_short_3ps": -32.18187076635949,
        "metad_residual_median": -6.78,
        "nodes": nodes.tolist(),
        "dUdlam": [float(v) for v in prof],
        "wall_s": time.time() - t0,
    }
    with open("examples/results/hewl_ti_recal_v5e.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"dG_ref_long": dG}))


if __name__ == "__main__":
    main()
