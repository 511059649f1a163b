"""Viz export smoke tests (sim/viz.py — headless analog of the reference's
viewer overlays)."""
import numpy as np
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc import gait
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim import viz
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def test_plot_rollout(tmp_path):
    qs = np.random.default_rng(0).standard_normal((50, 19)) * 0.01
    qs[:, 2] += 0.3
    taus = np.random.default_rng(1).standard_normal((50, 12))
    p = viz.plot_rollout(qs, taus, path=str(tmp_path / "r.png"))
    import os
    assert os.path.getsize(p) > 1000


def test_plot_plan(tmp_path):
    cfg = MPCConfig().validate()
    x0 = jnp.zeros(13).at[2].set(0.3).at[9].set(1.0)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0,
                              jnp.zeros((4, 2)))
    p = viz.plot_plan(traj, cfg, path=str(tmp_path / "p.png"))
    import os
    assert os.path.getsize(p) > 1000


def test_plot_plan_overlay(tmp_path):
    from bilevel_gait_gen_tpu.models import a1, srb
    cfg = MPCConfig().validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config())
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv))
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0,
                              jnp.zeros((4, 2)))
    qs = np.tile(np.asarray(q0)[None, :], (40, 1))
    p = viz.plot_plan_overlay(traj, cfg, params, qs,
                              path=str(tmp_path / "o.png"))
    import os
    assert os.path.getsize(p) > 1000


def test_viewer_user_scene_overlay():
    """The live viewer overlay (Simulator::UpdateVizGeoms equivalent,
    mujoco_bridge.MujocoLoop._draw_overlay) populates a user scene with
    plan geoms — exercised headless against a raw MjvScene."""
    import mujoco
    from bilevel_gait_gen_tpu.models import a1
    from bilevel_gait_gen_tpu.sim.mujoco_bridge import MujocoLoop
    loop = MujocoLoop(a1.make_a1())
    loop.overlay = {
        "com_traj": np.linspace([0, 0, 0.3], [0.5, 0, 0.3], 21),
        "footholds": np.array([[0.2, 0.15], [0.2, -0.15]]),
        "ee_box": (np.array([[0.25, 0.15], [0.25, -0.15]]), (0.15, 0.15)),
    }
    scn = mujoco.MjvScene(loop.mj_model, maxgeom=200)
    loop._draw_overlay(scn)
    # 21 COM spheres + 2 footholds + 2 boxes
    assert scn.ngeom == 25
    assert scn.geoms[0].type == mujoco.mjtGeom.mjGEOM_SPHERE
    assert scn.geoms[scn.ngeom - 1].type == mujoco.mjtGeom.mjGEOM_BOX
