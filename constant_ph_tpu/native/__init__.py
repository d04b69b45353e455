"""Native (C++) runtime components, loaded via ctypes.

The reference's host runtime is C++ (LAMMPS core). The native tier here
covers the host-side runtime around the TPU compute path: topology graph
walks (exclusion builder, cell binning) and the LAMMPS data-file parser.
Pure-Python fallbacks are used automatically when the toolchain is absent.
"""
from constant_ph_tpu.native.build import load_library  # noqa: F401
