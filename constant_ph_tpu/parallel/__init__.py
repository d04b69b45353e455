"""Multi-device parallelism: pH replica exchange + spatial sharding.

The TPU-native replacement for the reference's MPI backend (SURVEY.md §5.8):
XLA collectives over an ICI mesh instead of MPI_Allreduce / ghost exchange.
"""
