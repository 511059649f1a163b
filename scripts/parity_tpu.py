"""TPU-vs-CPU parity check of the production f32 path, run on the real chip.

Runs the same 10-step rollout as scripts/gen_golden.py on the TPU backend
(f32, the production precision) and holds it to the committed f64 CPU
golden at the f32 bound — transitively checking TPU-vs-CPU agreement of
solve_step and outer_gradient (VERDICT round 1, "What's weak": no test
measures f32-on-TPU gradient quality).

Run:  python scripts/parity_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from scripts.gen_golden import rollout


def main():
    print("backend:", jax.default_backend())
    golden = np.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "a1_trot.npz"))
    xs, costs, grad, _ = rollout(jnp.float32)

    dx = np.max(np.abs(xs - golden["xs"]))
    dc = np.max(np.abs(costs - golden["costs"])
                / (1.0 + np.abs(golden["costs"])))
    g64 = golden["grad"].ravel()
    cos = float(np.dot(g64, grad.ravel())
                / (np.linalg.norm(g64) * np.linalg.norm(grad) + 1e-30))
    print(f"max |x_tpu32 - x_golden64| = {dx:.2e}  (bound 5e-3)")
    print(f"max rel cost diff        = {dc:.2e}  (bound 1e-2)")
    print(f"outer-gradient cosine    = {cos:.5f} (bound 0.99)")
    ok = dx < 5e-3 and dc < 1e-2 and cos > 0.99 and np.all(np.isfinite(xs))
    print("PARITY", "OK" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
