"""Procedural system builders (the input-deck layer, SURVEY.md layer D)."""

from constant_ph_tpu.systems.lj import lj_fluid  # noqa: F401
