"""Capture an XLA device trace of the batched solve and print the op-level
time breakdown (parsed from the xplane proto)."""
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    cfg = MPCConfig(ipm_iters=10, ipm_exact_every=3).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float32)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float32))
    feet0 = rbd.ee_positions(model, q0).astype(jnp.float32)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    x_des = srb.manifold_to_tangent(x0)
    qp = qp_mod.assemble(cfg, params, traj, x0, jnp.asarray(0.0), feet0,
                         x_des, jnp.asarray(cfg.ee_box_size))
    B = 128
    qps = jax.tree.map(lambda a: jnp.stack([a] * B), qp)

    @jax.jit
    def f(qpd):
        sol = jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
            H, q, A, b, G, h, iters=10, tol=cfg.ipm_tol, exact_every=3, use_pallas=False))(
            qpd.H, qpd.q, qpd.A, qpd.b, qpd.G, qpd.h)
        return sol.x

    out = f(qps)
    print("warm sum", float(jnp.sum(out)), flush=True)

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = f(qps)
        print("traced sum", float(jnp.sum(out)), flush=True)

    # parse the xplane proto
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        return
    from xprof.convert import raw_to_tool_data as rtd
    import json
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    tbl = d[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [[c["v"] for c in r["c"]] for r in tbl["rows"]]
    i_op = cols.index("operation"); i_t = cols.index("total_self_time")
    i_n = cols.index("occurrences"); i_dev = cols.index("host_or_device")
    i_type = cols.index("type")
    dev = [r for r in rows if r[i_dev] == "Device"]
    dev.sort(key=lambda r: -r[i_t])
    tot = sum(r[i_t] for r in dev)
    print(f"total device self time: {tot/1e3:.1f} ms (3 calls)")
    for r in dev[:30]:
        print(f"{r[i_t]/1e3:9.2f} ms  n={r[i_n]:6}  {r[i_type][:18]:18s} "
              f"{r[i_op][:80]}")


if __name__ == "__main__":
    main()
