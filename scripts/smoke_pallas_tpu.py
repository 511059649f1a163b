"""TPU smoke + microbench for the fused Pallas IPM iteration.

Builds the real production QP (A1 trot, N=20 f32), solves it through both
inner-iteration backends, checks agreement, and times warm-started RTI
solves each way.  Run on the real chip:

    python scripts/smoke_pallas_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    print("backend:", jax.default_backend(), jax.devices())
    dtype = jnp.float32
    cfg = MPCConfig().validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)
    st, _ = solver.create_initial_run(cfg, params, st, x0, feet0, x_des)

    qp = qp_mod.assemble(cfg, params, st.traj, x0, jnp.asarray(0.0, dtype),
                         feet0, x_des, st.ee_box)
    n, m, p = qp.q.shape[-1], qp.h.shape[-1], qp.b.shape[-1]
    print(f"QP shape: n={n} m={m} p={p}")

    def run(use_pallas, warm=None, iters=18, exact_every=1):
        f = jax.jit(lambda: pdip.solve(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, iters=iters, tol=1e-7,
            exact_every=exact_every, use_pallas=use_pallas, warm=warm))
        t0 = time.perf_counter()
        sol = f()
        jax.block_until_ready(sol.x)
        t_compile = time.perf_counter() - t0
        return sol, f, t_compile

    sx, fx, tcx = run(False)
    print(f"XLA    cold: gap={float(sx.gap):.2e} pri={float(sx.pri_res):.2e} "
          f"iters={int(sx.iters)} (compile+run {tcx:.1f}s)")
    sp, fp, tcp = run(True)
    print(f"Pallas cold: gap={float(sp.gap):.2e} pri={float(sp.pri_res):.2e} "
          f"iters={int(sp.iters)} (compile+run {tcp:.1f}s)")
    dx = float(jnp.max(jnp.abs(sp.x - sx.x)) / (1 + jnp.max(jnp.abs(sx.x))))
    print(f"rel x diff: {dx:.2e}")

    # warm-started RTI regime timing (what production runs)
    for name, up in (("xla", False), ("pallas", True)):
        solw, fw, _ = run(up, warm=sx, iters=10, exact_every=3)
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            solw = fw()
        jax.block_until_ready(solw.x)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:6s} warm RTI solve: {dt:.2f} ms  "
              f"gap={float(solw.gap):.2e} iters={int(solw.iters)}")


if __name__ == "__main__":
    main()
