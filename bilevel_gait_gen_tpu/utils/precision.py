"""Matmul-precision control for TPU numerical safety.

TPU matmuls default to bfloat16 passes.  Every numerical path in this
framework that feeds a factorization or a feedback loop — QP assembly,
rigid-body mass matrices/jacobians, whole-body QP torque recovery, the
closed-loop engine — must run its matmuls at `highest` precision: measured
on the condensed MPC Hessian (natural scale ~1e8), bf16 rounding is ~0.5 %
relative, which makes the equilibrated Hessian *indefinite* (min eig -0.015
vs +5e-10 when assembled accurately) and NaNs the interior-point Cholesky.

These matrices are tiny (12x12 .. ~250x250); `highest` costs nothing
measurable next to the solver itself, so correctness wins.
"""
from __future__ import annotations

import functools

import jax


def highest_matmul_precision(fn):
    """Decorator: run every matmul traced inside ``fn`` at `highest`."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
