"""Compute kernels: pair (jnp + Pallas), bonded, Ewald k-space, constraints."""
