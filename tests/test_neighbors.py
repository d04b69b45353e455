"""Cell-list neighbor structure: parity vs O(N²) (SURVEY.md §7.2 step 2)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu import neighbors
from constant_ph_tpu.systems import lj_fluid
from constant_ph_tpu.state import min_image


def _neighbor_sets(nbr, n):
    idx = np.asarray(nbr.idx)
    return [set(row[row < n].tolist()) for row in idx]


def test_cell_list_matches_naive():
    ff, state, nbp = lj_fluid(n_cells=3, seed=1)
    n = state.x.shape[0]
    # jiggle positions so the lattice isn't degenerate
    key = jax.random.PRNGKey(7)
    x = state.x + 0.3 * jax.random.normal(key, state.x.shape)

    nbr_cell = neighbors.build_neighbor_list(
        x, state.box, nbp, ff.excl_idx, ff.excl_code
    )
    nbp_naive = dataclasses.replace(nbp, use_cells=False, capacity=n)
    nbr_naive = neighbors.build_neighbor_list(
        x, state.box, nbp_naive, ff.excl_idx, ff.excl_code
    )
    assert not bool(nbr_cell.overflow)
    assert not bool(nbr_naive.overflow)

    sets_c = _neighbor_sets(nbr_cell, n)
    sets_n = _neighbor_sets(nbr_naive, n)
    # naive keeps everything within rc+skin; cell list must agree exactly
    for i in range(n):
        assert sets_c[i] == sets_n[i], f"atom {i} neighbor mismatch"


def test_neighbor_distances_within_cutoff():
    ff, state, nbp = lj_fluid(n_cells=3, seed=2)
    n = state.x.shape[0]
    nbr = neighbors.build_neighbor_list(
        state.x, state.box, nbp, ff.excl_idx, ff.excl_code
    )
    idx = np.asarray(nbr.idx)
    x = np.asarray(state.x)
    box = np.asarray(state.box)
    for i in range(0, n, 17):
        for j in idx[i]:
            if j < n:
                dx = x[i] - x[j]
                dx -= box * np.round(dx / box)
                assert np.linalg.norm(dx) < nbp.cutoff + 1e-4


def test_rebuild_trigger():
    ff, state, nbp = lj_fluid(n_cells=3)
    nbr = neighbors.build_neighbor_list(
        state.x, state.box, nbp, ff.excl_idx, ff.excl_code
    )
    assert not bool(neighbors.needs_rebuild(nbr, state.x, state.box, nbp))
    x2 = state.x.at[0, 0].add(0.51 * nbp.skin + 1e-3)
    assert bool(neighbors.needs_rebuild(nbr, x2, state.box, nbp))


def test_overflow_detection():
    # cram atoms into a tiny capacity to force overflow
    ff, state, nbp = lj_fluid(n_cells=3)
    small = dataclasses.replace(nbp, capacity=8)
    nbr = neighbors.build_neighbor_list(
        state.x, state.box, small, ff.excl_idx, ff.excl_code
    )
    assert bool(nbr.overflow)
