"""Finite-difference consistency check of the λ force.

U_elec is exactly quadratic in q, and q is linear in λ, so the central
difference (U(λ+ε) − U(λ−ε)) / 2ε equals dU/dλ AT the midpoint exactly
(no cubic remainder) — any gap beyond float rounding is a term missing
from φ = ∂U/∂q (the contract of lambda_dyn.dq_dlambda_dot; ref
fix_constant_pH.cpp:264-277, the HB−HA differencing this φ·dq replaces).

Runs per electrostatics style (DSF / PME / Ewald) on a small CPU
system. This is the diagnostic that localized the round-5 λ-live PME
NVE blowup (examples/results/nve_drift_pme_k1_v5e.json).
"""
from __future__ import annotations

import json

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.systems.water import solvated_acid
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import split_system, to_tiled

    out = {}
    for tag, style, alpha, kspace in (
            ("dsf", "dsf", 0.2, None),
            ("pme", "cut", 0.30, "pme"),
            ("ewald", "cut", 0.30, "ewald")):
        sys_ = solvated_acid(
            n_side=6, rigid_water=True, lambda_coupled=True,
            cutoff=6.0, skin=1.5, coul_style=style, alpha=alpha,
            seed=3, pH=5.0)
        ts = split_system(sys_, skin=1.5)
        tst = to_tiled(ts, sys_.state)
        tst = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tst)
        kep = None
        if kspace == "pme":
            from constant_ph_tpu.ops.pme import make_pme_params
            kep = make_pme_params(np.asarray(sys_.state.box),
                                  ts.params.grid, alpha, spacing=1.0, p=6)
        elif kspace == "ewald":
            from constant_ph_tpu.ops.ewald import make_ewald_params
            kep = make_ewald_params(np.asarray(sys_.state.box), alpha,
                                    kmax=8)
        cfg = EngineConfig(dt=1.0, thermostat="nve",
                           lambda_thermostat="none", rebuild_every=10)
        eng = TiledEngine(ts, cfg, kspace_ep=kep)

        def e_elec(lam):
            frc = eng.compute_forces(tst.replace(lam=lam))
            return frc.e_coul + frc.e_kspace

        def dudl(lam):
            return eng.compute_forces(tst.replace(lam=lam)).dUdlam

        lam0 = jnp.full_like(tst.lam, 0.37)
        eps = 1e-4
        rows = []
        for s in range(int(tst.lam.shape[0])):
            d = jnp.zeros_like(lam0).at[s].set(eps)
            fd = (e_elec(lam0 + d) - e_elec(lam0 - d)) / (2 * eps)
            an = dudl(lam0)[s]
            rows.append((float(fd), float(an)))
        gaps = [abs(fd - an) for fd, an in rows]
        out[tag] = {"fd_vs_phi_dq": rows, "max_gap_kcal": max(gaps)}
        print(f"{tag}: max |FD − φ·dq| = {max(gaps):.6f} kcal/mol "
              f"(rows: {[(round(a, 4), round(b, 4)) for a, b in rows]})")
    with open("examples/results/fd_dudl_check.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
