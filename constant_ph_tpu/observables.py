"""Observable streaming + analysis (SURVEY.md §5.5).

The reference intended to expose λ, v_λ, H_λ, HA, HB through
compute_scalar/compute_vector (fix_constant_pH.h:37-38, unimplemented).
Here the jitted step already returns an Observables pytree per step; this
module is the host-side sink: thinning, JSONL/CSV writers, and the
titration estimators (protonation fraction, λ population statistics).
"""
from __future__ import annotations

import dataclasses
import json
from typing import IO, Iterable

import numpy as np


def observables_to_rows(obs, every: int = 1) -> Iterable[dict]:
    """Flatten a stacked Observables pytree (leading time axis) to dict rows."""
    fields = [f.name for f in dataclasses.fields(obs)]
    arrays = {name: np.asarray(getattr(obs, name)) for name in fields}
    n = len(next(iter(arrays.values())))
    for t in range(0, n, every):
        row = {}
        for name, a in arrays.items():
            v = a[t]
            row[name] = v.tolist() if v.ndim else float(v)
        yield row


def write_jsonl(obs, fh: IO[str], every: int = 1, step0: int = 0) -> None:
    for i, row in enumerate(observables_to_rows(obs, every)):
        row["step"] = step0 + i * every
        fh.write(json.dumps(row) + "\n")


def write_csv(obs, fh: IO[str], every: int = 1, step0: int = 0) -> None:
    rows = list(observables_to_rows(obs, every))
    if not rows:
        return
    # expand vector observables (lam, v_lam, dUdlam) into indexed columns
    def expand(row):
        out = {}
        for k, v in row.items():
            if isinstance(v, list):
                for i, vi in enumerate(v):
                    out[f"{k}_{i}"] = vi
            else:
                out[k] = v
        return out

    rows = [expand(r) for r in rows]
    cols = list(rows[0].keys())
    fh.write("step," + ",".join(cols) + "\n")
    for i, r in enumerate(rows):
        fh.write(str(step0 + i * every) + ","
                 + ",".join(f"{r[c]:.8g}" for c in cols) + "\n")


def protonation_fraction(lam_trace: np.ndarray, burn_in: float = 0.25):
    """Time-averaged deprotonated fraction per site: ⟨λ > ½⟩.

    lam_trace: (T, S). The acceptance criterion of SURVEY.md §9 — compare
    against Henderson–Hasselbalch 1/(1+10^(pK−pH)).
    """
    lam_trace = np.asarray(lam_trace)
    t0 = int(burn_in * lam_trace.shape[0])
    return (lam_trace[t0:] > 0.5).mean(axis=0)


def hh_curve(pK, pH):
    """Henderson–Hasselbalch deprotonated fraction."""
    return 1.0 / (1.0 + 10.0 ** (np.asarray(pK) - np.asarray(pH)))
