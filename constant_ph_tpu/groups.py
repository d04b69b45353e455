"""Named atom groups (SURVEY.md §2.3.2 — the LAMMPS Group subsystem analog).

The reference resolves group names to bitmasks and tests membership with
`mask[i] & bit` (fix_constant_pH.cpp:39-46, 164, 266). TPU-native: named
boolean masks over the atom axis with masked-reduction helpers.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class Groups:
    def __init__(self, n_atoms: int):
        self.n_atoms = n_atoms
        self._masks: dict = {"all": jnp.ones((n_atoms,), dtype=bool)}

    def define(self, name: str, ids=None, mask=None) -> jax.Array:
        """Define a group by atom ids or a boolean mask (ref: group command)."""
        if mask is None:
            mask = np.zeros((self.n_atoms,), dtype=bool)
            mask[np.asarray(ids, dtype=np.int64)] = True
        m = jnp.asarray(mask)
        self._masks[name] = m
        return m

    def find(self, name: str) -> jax.Array:
        """Lookup (the group->find analog); KeyError mirrors the reference's
        'Cannot find the ... group' validation (fix_constant_pH.cpp:40)."""
        if name not in self._masks:
            raise KeyError(f"cannot find group '{name}'")
        return self._masks[name]

    def count(self, name: str) -> int:
        """group->count analog (used to validate the 3-atom water group,
        fix_constant_pH.cpp:44-46)."""
        return int(jnp.sum(self.find(name)))

    def union(self, *names: str) -> jax.Array:
        m = self.find(names[0])
        for n in names[1:]:
            m = m | self.find(n)
        return m

    @staticmethod
    def masked_sum(values, mask):
        return jnp.sum(jnp.where(mask, values, 0))


def check_finite(tree, name: str = "state"):
    """Failure-detection guard (SURVEY.md §5.3): host-side NaN/Inf check of
    a pytree; raises with the offending leaf path."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}")
