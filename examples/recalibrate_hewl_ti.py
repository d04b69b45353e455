"""Long-TI recalibration of dG_ref on the HEWL-scale 16-buffer system.

Why: the round-3 metadynamics titration run revealed a systematic
~-6..-8 kcal/mol residual tilt toward the deprotonated basin across all
20 sites and 8 mature pH walkers (V-table ΔF vs the Henderson-Hasselbalch
expectation, examples/results/metad_multisite_ckpt.npz at chunk 60). The
production dG_ref = -32.18 kcal/mol came from the driver's quick TI
(3 ps/node at dt=1): water reorganization around a charging site spread
over 16 buffer waters is slower than that, which under-converges
<dU/dlam> toward less-negative values and shrinks |dG_ref| — exactly the
observed sign. This script reruns the SAME Gauss-Legendre TI protocol at
a chosen per-node length and node count, starting from a
production-relaxed solvent state (140 ps of metadynamics dynamics), to
converge the constant: successive protocols (4 -> 8 -> 16 ps/node, 7 vs
9 nodes) must agree within ~0.5 kcal/mol before the campaign constant is
trusted (VERDICT r3 item 2).

  PYTHONPATH=/root/repo python examples/recalibrate_hewl_ti.py \
      --equil-steps 4000 --sample-steps 16000 --nodes 7 \
      --out examples/results/hewl_ti_recal16_v5e.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def gl_nodes(n):
    """n-point Gauss-Legendre nodes/weights mapped to [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return (x + 1.0) / 2.0, w / 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--equil-steps", type=int, default=800)
    ap.add_argument("--sample-steps", type=int, default=4000,
                    help="per-node sampling at dt=1 fs (= ps/node x 1000)")
    ap.add_argument("--nodes", type=int, default=7,
                    help="Gauss-Legendre node count (7 = round-3 protocol; "
                         "9 checks quadrature error)")
    ap.add_argument("--call-steps", type=int, default=4000,
                    help="max MD steps per XLA call (the axon worker "
                         "kills ~100 s device calls; 4000 HEWL steps "
                         "~ 25 s)")
    ap.add_argument("--site", type=int, default=0)
    ap.add_argument("--ckpt", default="examples/results/"
                                      "metad_multisite_ckpt.npz",
                    help="metad checkpoint supplying the relaxed solvent "
                         "state (replica 0)")
    ap.add_argument("--out", default="examples/results/hewl_ti_recal_v5e.json")
    args = ap.parse_args()

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

    ck = np.load(args.ckpt)
    W = int(ck["W"])
    with jax.default_device(cpu):
        ts, tst = retile(ts, tst, W)
    # adopt replica 0's production-relaxed atoms (same layout, W matches)
    leaves, treedef = jax.tree_util.tree_flatten(tst)
    # forward-tolerant: fields appended to TiledState after the ckpt was
    # written keep their template values (flax struct = field order)
    n_saved = int(ck["n_leaves"])
    assert n_saved <= len(leaves), "ckpt/layout mismatch"
    new = [jnp.asarray(ck[f"leaf{i}"][0], leaves[i].dtype)
           if i < n_saved else leaves[i]
           for i in range(len(leaves))]
    tst = jax.tree_util.tree_unflatten(treedef, new)
    tst = jax.device_put(tst, jax.devices()[0])
    log(f"{sys_.state.x.shape[0]} atoms, W={W}, resumed replica-0 solvent "
        f"({time.time()-t0:.0f}s)")

    nodes, weights = gl_nodes(args.nodes)
    cfg_cal = EngineConfig(dt=1.0, thermostat="langevin", T=300.0,
                           gamma=0.01, lambda_thermostat="langevin",
                           rebuild_every=12)
    dG, (nodes_out, prof) = titration.calibrate_dG_ref_tiled(
        ts, tst, cfg_cal, bias=BiasParams(), site=args.site,
        equil_steps=args.equil_steps, sample_steps=args.sample_steps,
        call_steps=args.call_steps, nodes=nodes, weights=weights,
        return_profile=True)
    ps = args.sample_steps / 1000.0
    log(f"TI dG_ref = {dG:.3f} kcal/mol at {ps:g} ps/node x {args.nodes} "
        f"nodes ({time.time()-t0:.0f}s)")
    out = {
        "system": "HEWL-scale 27300-atom polypeptide, 20 sites, "
                  "n_buffer_waters=16, full dq",
        "protocol": f"{args.nodes}-node Gauss-Legendre TI, site "
                    f"{args.site}, others lam=0, equil {args.equil_steps} "
                    f"+ sample {args.sample_steps} steps/node at dt=1 fs, "
                    f"start = replica-0 state of metad_multisite ckpt "
                    f"(~140 ps relaxed)",
        "dG_ref": dG,
        "history": {"3ps_7node": -32.18, "4ps_7node": -41.95,
                    "8ps_7node": -39.49},
        "nodes": nodes_out.tolist(),
        "dUdlam": [float(v) for v in prof],
        "wall_s": time.time() - t0,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"dG_ref": dG, "ps_per_node": ps,
                      "n_nodes": args.nodes}))


if __name__ == "__main__":
    main()
