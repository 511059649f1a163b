"""Solve-stats ring buffer + table printer (observability).

Replaces the reference's RecordStats/PrintStats/PrintStatLineToFile
(mpc/mpc.cpp:804-989): same columns (solve #, time ms, constraint
violation, step norm, alpha, cost, merit, QP residuals, solve type), kept
as a fixed-size on-device ring buffer so recording adds no host sync;
printing/pulling happens only when asked.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

COLUMNS = ("solve", "time_ms", "defect_l1", "step_norm", "alpha", "cost",
           "merit", "qp_gap", "qp_pri", "qp_dua", "solved")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StatsRing:
    data: jax.Array   # [cap, len(COLUMNS)]
    head: jax.Array   # scalar int32


def make_ring(capacity: int = 512, dtype=jnp.float32) -> StatsRing:
    return StatsRing(data=jnp.zeros((capacity, len(COLUMNS)), dtype),
                     head=jnp.zeros((), jnp.int32))


def record(ring: StatsRing, solve_idx, time_ms, stats) -> StatsRing:
    """Append one SolveStats row (device-side, no sync)."""
    row = jnp.stack([
        jnp.asarray(solve_idx, ring.data.dtype),
        jnp.asarray(time_ms, ring.data.dtype),
        stats.defect_l1.astype(ring.data.dtype),
        stats.step_norm.astype(ring.data.dtype),
        stats.alpha.astype(ring.data.dtype),
        stats.cost.astype(ring.data.dtype),
        stats.merit.astype(ring.data.dtype),
        stats.qp_gap.astype(ring.data.dtype),
        stats.qp_pri.astype(ring.data.dtype),
        stats.qp_dua.astype(ring.data.dtype),
        stats.solved.astype(ring.data.dtype),
    ])
    cap = ring.data.shape[0]
    idx = ring.head % cap
    return StatsRing(data=ring.data.at[idx].set(row), head=ring.head + 1)


def print_table(ring: StatsRing, last: int = 20, file=None) -> str:
    """Render the last rows as the reference's stats table."""
    head = int(ring.head)
    cap = ring.data.shape[0]
    n = min(head, cap, last)
    rows = []
    data = np.asarray(ring.data)
    for i in range(head - n, head):
        rows.append(data[i % cap])
    hdr = " | ".join(f"{c:>10s}" for c in COLUMNS)
    sep = "-" * len(hdr)
    lines = [hdr, sep]
    for r in rows:
        lines.append(" | ".join(f"{v:10.4g}" for v in r))
    out = "\n".join(lines)
    if file:
        with open(file, "a") as f:
            f.write(out + "\n")
    else:
        print(out)
    return out
