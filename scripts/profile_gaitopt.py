"""Round-3 profiling: break the gait-opt update and single-solve latency
into components on the real chip.  Not a test; a measurement tool."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import bilevel, gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def timeit(fn, *args, n=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:45s} {ms:8.2f} ms")
    return out, ms


def main():
    BATCH = int(os.environ.get("B", "128"))
    cfg = MPCConfig(ipm_iters=10, ipm_exact_every=3).validate()
    dtype = jnp.float32

    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    state = solver.make_state(cfg, traj, jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)
    t0 = jnp.asarray(0.0, dtype)

    key = jax.random.PRNGKey(0)
    pert = 0.02 * jax.random.normal(key, (BATCH, 13), dtype)
    x0s = x0[None, :] + pert.at[:, 6:10].set(0.0)
    states = jax.tree.map(lambda a: jnp.stack([a] * BATCH), state)
    feets = jnp.stack([feet0] * BATCH)

    # warm the states with one RTI
    step = jax.jit(jax.vmap(
        lambda st, x, ee: solver.solve_step(cfg, params, st, x, t0, ee, x_des),
        in_axes=(0, 0, 0)))
    states, stats = step(states, x0s, feets)
    jax.block_until_ready(stats.cost)
    _, rti_ms = timeit(lambda s: step(s, x0s, feets), states, n=10,
                       label=f"RTI batch={BATCH}")

    # --- component: assembly only -----------------------------------------
    asm = jax.jit(jax.vmap(
        lambda st, x, ee: qp_mod.assemble(cfg, params, st.traj, x, t0, ee,
                                          x_des, st.ee_box)))
    timeit(lambda: asm(states, x0s, feets), n=10, label="assemble only")

    # --- component: outer gradient (old full-solve path) -------------------
    og = jax.jit(jax.vmap(
        lambda st, x, ee: bilevel.outer_gradient(
            cfg, params, st.traj, x, t0, ee, x_des, st.ee_box,
            warm=st.qp_warm)))
    timeit(lambda: og(states, x0s, feets), n=5, label="outer_gradient (legacy full solve)")

    # --- component: outer gradient at captured solution --------------------
    def grad_at(st, x, ee):
        st1, stats, ext = solver.solve_step(cfg, params, st, x, t0, ee,
                                            x_des, return_ext=True)
        return bilevel.outer_gradient_at(cfg, params, ext.traj_lin, x, t0,
                                         ee, x_des, st.ee_box, ext.sol)

    oga = jax.jit(jax.vmap(grad_at))
    timeit(lambda: oga(states, x0s, feets), n=5,
           label="RTI + outer_gradient_at (fused)")

    # --- component: projection QP ------------------------------------------
    g = og(states, x0s, feets)
    cts = jax.jit(jax.vmap(
        lambda st, gg: bilevel.contact_time_step(cfg, st.traj.sched, gg, t0)))
    timeit(lambda: cts(states, g), n=10, label="contact_time_step")

    # --- component: paid lanes ---------------------------------------------
    d = cts(states, g)
    ls = jax.jit(jax.vmap(
        lambda st, dd, x, ee: bilevel._lane_search(cfg, params, st, dd, x,
                                                   t0, ee, x_des)))
    timeit(lambda: ls(states, d, x0s, feets), n=5,
           label=f"_lane_search ({cfg.ls_alphas} lanes incl. alpha=0)")

    # --- full gait_opt_update ----------------------------------------------
    gu = jax.jit(jax.vmap(
        lambda st, x, ee: bilevel.gait_opt_update(cfg, params, st, x, t0, ee,
                                                  x_des),
        in_axes=(0, 0, 0)))
    timeit(lambda: gu(states, x0s, feets), n=5, label="gait_opt_update (full)")

    # --- single-solve latency, batch 1 -------------------------------------
    step1 = jax.jit(lambda st, x, ee: solver.solve_step(
        cfg, params, st, x, t0, ee, x_des))
    st1, s1 = step1(state, x0, feet0)
    jax.block_until_ready(s1.cost)
    lats = []
    for _ in range(30):
        t1 = time.perf_counter()
        st1, s1 = step1(st1, x0, feet0)
        jax.block_until_ready(s1.cost)
        lats.append((time.perf_counter() - t1) * 1e3)
    print(f"{'single-solve batch=1':45s} p50={np.percentile(lats, 50):6.2f} "
          f"p99={np.percentile(lats, 99):6.2f} ms")

    # exact_every=1 variant at batch 1
    cfg1 = MPCConfig(ipm_iters=10, ipm_exact_every=1).validate()
    step1e = jax.jit(lambda st, x, ee: solver.solve_step(
        cfg1, params, st, x, t0, ee, x_des))
    st1, s1 = step1e(state, x0, feet0)
    jax.block_until_ready(s1.cost)
    lats = []
    for _ in range(30):
        t1 = time.perf_counter()
        st1, s1 = step1e(st1, x0, feet0)
        jax.block_until_ready(s1.cost)
        lats.append((time.perf_counter() - t1) * 1e3)
    print(f"{'single-solve batch=1 exact_every=1':45s} "
          f"p50={np.percentile(lats, 50):6.2f} "
          f"p99={np.percentile(lats, 99):6.2f} ms")


if __name__ == "__main__":
    main()
