"""Pallas TPU kernels for the interior-point hot path.

The IPM's dominant operation is forming the reduced KKT matrix
M = H + G^T diag(W) G every iteration (ops/pdip.py).  XLA materializes
Gw = G * W into HBM and then runs a batched GEMM — one full extra HBM pass
over G per iteration.  The Pallas kernel fuses the diagonal scaling into
the contraction: G tiles stream HBM -> VMEM once, the W-scale is applied
in-register, and the MXU accumulates the [128, 128] output tile in VMEM
scratch across the reduction steps.

Interfaces degrade gracefully: on non-TPU backends (CPU tests) the XLA
reference path runs instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def gtwg_reference(H: jax.Array, G: jax.Array, W: jax.Array) -> jax.Array:
    """XLA reference path for M = H + G^T diag(W) G (batched)."""
    with jax.default_matmul_precision("highest"):
        Gw = G * W[:, :, None]
        return H + jnp.einsum('bmi,bmj->bij', Gw, G)


def gtwg(H: jax.Array, G: jax.Array, W: jax.Array,
         block_n: int = 128, block_k: int = 512,
         interpret: bool = False) -> jax.Array:
    """Batched M = H + G^T diag(W) G via a fused Pallas kernel.

    H: [B, n, n], G: [B, m, n], W: [B, m] -> [B, n, n].  Pads n to a
    multiple of block_n and m to block_k (zero rows of G with W = 0
    contribute nothing, so padding is exact).
    """
    if not _HAS_PALLAS or (not interpret
                           and jax.default_backend() not in ("tpu", "axon")):
        return gtwg_reference(H, G, W)

    B, m, n = G.shape
    n_p = _round_up(n, block_n)
    m_p = _round_up(m, block_k)
    Hp = jnp.pad(H, ((0, 0), (0, n_p - n), (0, n_p - n)))
    Gp = jnp.pad(G, ((0, 0), (0, m_p - m), (0, n_p - n)))
    Wp = jnp.pad(W, ((0, 0), (0, m_p - m)))[:, None, :]   # [B, 1, m_p]
    n_k = m_p // block_k

    def kernel(h_ref, gi_ref, gj_ref, w_ref, out_ref, acc_ref):
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        gi = gi_ref[0].astype(jnp.float32)          # [block_k, bn] (rows i)
        gj = gj_ref[0].astype(jnp.float32)          # [block_k, bn] (rows j)
        w = w_ref[0, 0].astype(jnp.float32)         # [block_k]
        gi_w = gi * w[:, None]                      # fused diag scaling
        acc_ref[...] += jax.lax.dot_general(
            gi_w, gj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k == n_k - 1)
        def _():
            out_ref[0] = (acc_ref[...]
                          + h_ref[0].astype(jnp.float32)).astype(out_ref.dtype)

    grid = (B, n_p // block_n, n_p // block_n, n_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, block_n), lambda b, i, j, k: (b, i, j)),
            pl.BlockSpec((1, block_k, block_n), lambda b, i, j, k: (b, k, i)),
            pl.BlockSpec((1, block_k, block_n), lambda b, i, j, k: (b, k, j)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j, k: (b, 0, k)),
        ],
        out_specs=pl.BlockSpec((1, block_n, block_n),
                               lambda b, i, j, k: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, n_p, n_p), H.dtype),
        scratch_shapes=[pltpu.VMEM((block_n, block_n), jnp.float32)],
        interpret=interpret,
    )(Hp, Gp, Gp, Wp)
    return out[:, :n, :n]
