"""Inspect the compiled HLO of the sharded tiled step (SURVEY.md §5.8).

Question to substantiate (docs/DESIGN.md §6): when the cell grid's x axis
is sharded over a mesh, do the stencil rolls lower to XLA
collective-permutes over the mesh (the ghost-exchange analog of
fix_constant_pH.cpp:287-308), or does GSPMD all-gather the tile arrays?

Run on the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/inspect_sharded_hlo.py [n_shards]

Prints per-collective instruction counts and the shapes moved, and exits
nonzero if any per-step all-gather moves a full tile array (i.e. the
sharding is not actually a halo exchange).
"""
from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.parallel.spatial import (
    make_spatial_mesh, shard_tiled_state)
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import split_system, to_tiled


def analyze(n_sp: int = 4, *, production_density: bool = True):
    # production-density box (3.1 Å spacing ≈ bench.py headline density)
    kw = dict(n_side=16, spacing=3.1) if production_density else \
        dict(n_side=8, spacing=6.4)
    sys_sp = solvated_acid(
        rigid_water=True, lambda_coupled=True,
        cutoff=8.0, skin=2.0, coul_style="dsf", alpha=0.2, **kw)
    ts = split_system(sys_sp)
    assert ts.params.grid[0] % n_sp == 0, (ts.params.grid, n_sp)
    tst = to_tiled(ts, sys_sp.state)
    mesh = make_spatial_mesh(n_sp)
    tst = shard_tiled_state(tst, mesh, ts.params)
    eng = TiledEngine(ts, EngineConfig(
        dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
        lambda_thermostat="langevin", rebuild_every=2))
    run = jax.jit(eng.make_run(2))
    txt = run.lower(tst).compile().as_text()

    counts = collections.Counter()
    shapes = collections.defaultdict(set)
    for m in re.finditer(
            r"(\w[\w.\d]*) = (\S+) (collective-permute|all-gather|"
            r"all-reduce|all-to-all|reduce-scatter)\(", txt):
        counts[m.group(3)] += 1
        shapes[m.group(3)].add(m.group(2))
    return ts, counts, dict(shapes), txt


def main():
    n_sp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ts, counts, shapes, txt = analyze(n_sp)
    G = ts.params.G
    W = ts.params.W
    print(f"# grid {ts.params.grid} (G={G}) W={W}, {n_sp}-way x-slab")
    for op, n in sorted(counts.items()):
        print(f"{op:20s} x{n}")
        for s in sorted(shapes[op]):
            print(f"    {s}")
    # a full (3, G, 3W) f32 tile array all-gather would defeat the slab
    # decomposition: flag any all-gather whose result is >= the full tile
    full_tile = 3 * G * 3 * W
    bad = []
    for s in shapes.get("all-gather", ()):
        dims = re.findall(r"\d+", s)
        n_elem = 1
        for d in dims:
            n_elem *= int(d)
        if n_elem >= full_tile:
            bad.append(s)
    if bad:
        print(f"FAIL: per-step all-gather of full tile array(s): {bad}")
        return 1
    print("OK: no full-tile all-gather in the compiled sharded step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
