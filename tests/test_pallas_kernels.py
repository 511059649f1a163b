"""Pallas kernel tests (interpret mode on CPU): fused G^T W G correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.ops import pallas_kernels as pk


def test_gtwg_matches_reference_interpret():
    rng = np.random.default_rng(0)
    B, m, n = 2, 300, 130      # deliberately unaligned
    H = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    G = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    W = jnp.asarray(np.abs(rng.standard_normal((B, m))), jnp.float32)
    ref = pk.gtwg_reference(H, G, W)
    out = pk.gtwg(H, G, W, block_n=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-3)


def test_gtwg_fallback_on_cpu():
    rng = np.random.default_rng(1)
    H = jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)
    G = jnp.asarray(rng.standard_normal((1, 24, 16)), jnp.float32)
    W = jnp.asarray(np.abs(rng.standard_normal((1, 24))), jnp.float32)
    out = pk.gtwg(H, G, W)    # CPU -> reference path
    ref = pk.gtwg_reference(H, G, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
