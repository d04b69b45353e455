"""Jit-compiled neighbor structure: cell list → padded (N, K) neighbor lists.

The TPU-native equivalent of the LAMMPS neighbor list the reference planned
to consume via init_list (fix_constant_pH.h:40) — SURVEY.md §2.3.11. Fixed
shapes everywhere: atoms are binned into a static cell grid with fixed
capacity, candidates gathered from a static stencil, and the K nearest
candidates kept per atom (K sized so that every atom within the cutoff+skin
sphere fits, with overflow detection instead of reallocation).

Rebuild policy is the LAMMPS skin trigger: rebuild when any atom has moved
more than skin/2 since the list was built.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu.state import min_image, wrap


@struct.dataclass
class NeighborParams:
    """Static sizing of the neighbor structure (host-side decisions)."""

    cutoff: float = struct.field(pytree_node=False)        # rc + skin, Å
    skin: float = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)        # K neighbors/atom
    grid: tuple = struct.field(pytree_node=False)          # cells per dim
    cell_capacity: int = struct.field(pytree_node=False)   # C atoms/cell
    stencil: tuple = struct.field(pytree_node=False)       # flat cell offsets
    use_cells: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class NeighborList:
    idx: jax.Array       # (N, K) int32 neighbor ids, padded with N (sentinel)
    code: jax.Array      # (N, K) int32 special-bond code 0..3
    x_ref: jax.Array     # (N, 3) positions at build time
    overflow: jax.Array  # () bool — list or cell capacity exceeded

    @property
    def capacity(self) -> int:
        return self.idx.shape[1]


def make_neighbor_params(
    box,
    cutoff: float,
    *,
    n_atoms: int,
    skin: float = 2.0,
    capacity: int | None = None,
    safety: float = 1.35,
    target_cells_per_cutoff: int = 1,
    use_cells: bool | None = None,
) -> NeighborParams:
    """Host-side sizing: pick grid, per-cell and per-atom capacities.

    ``capacity`` defaults to safety × expected neighbors in the (rc+skin)
    sphere at the system's mean density, rounded up to a lane-friendly
    multiple of 128 (or 8 for small systems).
    """
    box = np.asarray(box, dtype=np.float64)
    if cutoff > float(box.min()) / 2.0 + 1e-9:
        raise ValueError(
            f"pair cutoff {cutoff} exceeds half the smallest box length "
            f"({box.min() / 2:.3f}); minimum-image convention would be violated"
        )
    rc = cutoff + skin
    vol = float(np.prod(box))
    density = n_atoms / vol

    if use_cells is None:
        use_cells = n_atoms > 512

    # cell size: rc / target_cells_per_cutoff, at least 1 cell per dim
    cell_target = rc / max(1, target_cells_per_cutoff)
    grid = tuple(int(max(1, np.floor(b / cell_target))) for b in box)
    cell_size = box / np.maximum(np.array(grid), 1)
    # stencil reach: how many cells to cover rc in each dim
    reach = tuple(int(np.ceil(rc / cs)) if g > 1 else 0
                  for cs, g in zip(cell_size, grid))
    offsets = []
    for ox in range(-reach[0], reach[0] + 1):
        for oy in range(-reach[1], reach[1] + 1):
            for oz in range(-reach[2], reach[2] + 1):
                offsets.append((ox, oy, oz))
    cell_vol = float(np.prod(cell_size))
    cell_cap = int(np.ceil(density * cell_vol * (safety + 0.35))) + 4
    cell_cap = max(8, -(-cell_cap // 8) * 8)

    if capacity is None:
        nsphere = density * 4.0 / 3.0 * np.pi * rc**3
        capacity = int(np.ceil(nsphere * safety)) + 8
    mult = 128 if capacity > 128 else 8
    capacity = -(-capacity // mult) * mult
    capacity = min(capacity, n_atoms)

    return NeighborParams(
        cutoff=float(rc),
        skin=float(skin),
        capacity=int(capacity),
        grid=grid,
        cell_capacity=int(cell_cap),
        stencil=tuple(offsets),
        use_cells=bool(use_cells),
    )


def _special_codes(idx, excl_idx, excl_code):
    """Label each neighbor with its special-bond code by matching against
    the per-atom exclusion table (built host-side in forcefield.py)."""
    # idx: (N, K); excl_idx/code: (N, KE)
    match = idx[:, :, None] == excl_idx[:, None, :]          # (N, K, KE)
    return jnp.sum(match * excl_code[:, None, :], axis=-1).astype(jnp.int32)


def _finalize(x, box, cand, params, excl_idx, excl_code, extra_overflow):
    """Candidate ids (N, C_all) → K-nearest padded neighbor list.

    TPU layout note: distances are computed per coordinate on (N, C)
    arrays (xyz as a leading batch axis) — materializing (N, C, 3) would
    lane-pad the trailing 3 to 128 on TPU, a 42× memory blowup.
    """
    n = x.shape[0]
    k = params.capacity
    rc2 = params.cutoff * params.cutoff

    cand = cand.astype(jnp.int32)
    cc = jnp.clip(cand, 0, n - 1)
    # three independent (N,) → (N, C) gathers; a fused (N, C, 3) form would
    # be lane-padded 3→128 by the TPU layout
    r2 = jnp.zeros(cc.shape, dtype=x.dtype)
    for d in range(3):
        xd = jax.lax.index_in_dim(x, d, axis=1, keepdims=False)  # (N,)
        dxd = min_image(xd[:, None] - xd[cc], box[d])
        r2 = r2 + dxd * dxd                                      # (N, C)
    self_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = (cand < n) & (cand != self_ids) & (r2 < rc2)
    # push invalid candidates to +inf distance so top_k keeps real ones
    r2k = jnp.where(valid, r2, jnp.inf)
    # K nearest candidates per row
    neg, sel = jax.lax.top_k(-r2k, k)                         # (N, K)
    idx = jnp.take_along_axis(cand, sel, axis=1)
    kept_valid = jnp.isfinite(-neg)
    idx = jnp.where(kept_valid, idx, n)                       # sentinel pad
    # overflow: more valid candidates than K for some atom
    n_valid = jnp.sum(valid, axis=1)
    overflow = jnp.any(n_valid > k) | extra_overflow
    code = _special_codes(idx, excl_idx, excl_code)
    return NeighborList(idx=idx, code=code, x_ref=x, overflow=overflow)


def build_neighbor_list(
    x, box, params: NeighborParams, excl_idx, excl_code
) -> NeighborList:
    """Build the padded neighbor list (jittable; shapes all static)."""
    n = x.shape[0]
    if not params.use_cells:
        cand = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
        return _finalize(x, box, cand, params, excl_idx, excl_code,
                         jnp.array(False))

    gx, gy, gz = params.grid
    ncells = gx * gy * gz
    cap = params.cell_capacity
    xw = wrap(x, box)
    cell_size = box / jnp.array(params.grid, dtype=x.dtype)
    ci = jnp.clip(
        jnp.floor(xw / cell_size).astype(jnp.int32),
        0,
        jnp.array(params.grid, dtype=jnp.int32) - 1,
    )                                                        # (N, 3)
    cid = (ci[:, 0] * gy + ci[:, 1]) * gz + ci[:, 2]          # (N,)

    # bin: sort by cell, rank within cell, scatter into fixed-capacity table
    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    first_of_cell = jnp.searchsorted(cid_sorted, cid_sorted, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first_of_cell.astype(jnp.int32)
    cell_overflow = jnp.any(rank >= cap)
    slot = jnp.clip(rank, 0, cap - 1)
    table = jnp.full((ncells * cap,), n, dtype=jnp.int32)
    table = table.at[cid_sorted * cap + slot].set(
        order.astype(jnp.int32), mode="drop"
    )
    table = table.reshape(ncells, cap)

    # gather stencil cells for each atom
    offs = jnp.array(params.stencil, dtype=jnp.int32)         # (S, 3)
    grid_arr = jnp.array(params.grid, dtype=jnp.int32)
    nbr_ci = (ci[:, None, :] + offs[None, :, :]) % grid_arr   # (N, S, 3)
    nbr_cid = (nbr_ci[..., 0] * gy + nbr_ci[..., 1]) * gz + nbr_ci[..., 2]
    cand = table[nbr_cid].reshape(n, -1)                      # (N, S*C)
    return _finalize(x, box, cand, params, excl_idx, excl_code, cell_overflow)


def needs_rebuild(nbr: NeighborList, x, box, params: NeighborParams):
    """Skin-displacement trigger (LAMMPS check_distance analog)."""
    dx = min_image(x - nbr.x_ref, box)
    max_d2 = jnp.max(jnp.sum(dx * dx, axis=-1))
    return max_d2 > (0.5 * params.skin) ** 2
