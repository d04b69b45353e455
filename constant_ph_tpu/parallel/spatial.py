"""Spatial domain decomposition over a device mesh (SURVEY.md §2.4, §5.8).

The reference scales by MPI spatial decomposition with ghost-atom exchange
(owned + ghost atoms per rank, reverse communication —
fix_constant_pH.cpp:200-208, 253, 287-308). The TPU-native equivalent falls
out of the tiled layout: shard the cell grid's x-axis across the mesh and
jit the SAME step function — the roll-stencil's shifts across shard
boundaries lower to XLA collective-permutes over ICI (the halo exchange),
and energy reductions become psums (the MPI_Allreduce of
fix_constant_pH.cpp:274). No newton-flag double-count bookkeeping exists:
every cell owns its accumulation.

Requirements: grid[0] divisible by the mesh axis size. Water tiles are
sharded; the (small) solute stays replicated; rebinning all-gathers
molecule rows (a per-rebuild, not per-step, cost).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from constant_ph_tpu.tiled.layout import TiledState, TileParams


def make_spatial_mesh(n_devices: int, axis: str = "x") -> Mesh:
    return Mesh(jax.devices()[:n_devices], (axis,))


def shard_tiled_state(tstate: TiledState, mesh: Mesh, params: TileParams,
                      axis: str = "x") -> TiledState:
    """Place water tiles sharded over the grid's x dimension.

    The (3, G, 3W) arrays have G linearized gx-major, so sharding the G
    axis into gx-aligned contiguous chunks IS an x-slab decomposition.
    """
    n_shards = mesh.shape[axis]
    gx = params.grid[0]
    if gx % n_shards:
        raise ValueError(
            f"grid x dimension {gx} not divisible by mesh axis {n_shards}")
    tile_spec = NamedSharding(mesh, P(None, axis, None))   # (3, G, 3W)
    cell_spec = NamedSharding(mesh, P(axis, None))         # (G, W)
    rep = NamedSharding(mesh, P())

    def place(x, spec):
        return jax.device_put(x, spec)

    return tstate.replace(
        wx=place(tstate.wx, tile_spec),
        wv=place(tstate.wv, tile_spec),
        wvalid=place(tstate.wvalid, cell_spec),
        wid=place(tstate.wid, cell_spec),
        sx=place(tstate.sx, rep),
        sv=place(tstate.sv, rep),
        box=place(tstate.box, rep),
        lam=place(tstate.lam, rep),
        v_lam=place(tstate.v_lam, rep),
        pH=place(tstate.pH, rep),
        step=place(tstate.step, rep),
        key=place(tstate.key, rep),
        nhc_xi=place(tstate.nhc_xi, rep),
        nhc_lam_xi=place(tstate.nhc_lam_xi, rep),
        phi_recip_s=place(tstate.phi_recip_s, rep),
        metad_v=place(tstate.metad_v, rep),
        metad_dv=place(tstate.metad_dv, rep),
        ext_work=place(tstate.ext_work, rep),
    )
