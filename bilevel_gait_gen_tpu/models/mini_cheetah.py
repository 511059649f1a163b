"""MIT Mini-Cheetah quadruped model (published parameters, programmatic).

Second quadruped family (reference carries mini_cheetah URDFs,
models/mini_cheetah/mini_cheetah_simple_v2.urdf).  EE order FL, FR, HL, HR
to match the trot pairing convention used for the A1 (diagonal pairs
FR+HL / FL+HR).
"""
from __future__ import annotations

import numpy as np

from bilevel_gait_gen_tpu.models.rbd import RobotModel

HIP_X = 0.19
HIP_Y = 0.049
ABDUCT_TO_THIGH_Y = 0.062
THIGH_LEN = 0.209
SHANK_TO_FOOT = 0.195

BODY = dict(m=3.3, com=(0.0, 0.0, 0.0),
            I=((0.011253, 0, 0), (0, 0.036203, 0), (0, 0, 0.042673)))


def _abduct(sy):
    return dict(m=0.54, com=(0.0, sy * 0.036, 0.0),
                I=((0.000381, sy * 0.000058, 4.5e-07),
                   (sy * 0.000058, 0.00056, sy * 9.5e-07),
                   (4.5e-07, sy * 9.5e-07, 0.000444)))


def _thigh(sy):
    return dict(m=0.634, com=(0.0, sy * 0.016, -0.02),
                I=((0.001983, sy * 0.000245, 1.3e-05),
                   (sy * 0.000245, 0.002103, sy * 1.5e-06),
                   (1.3e-05, sy * 1.5e-06, 0.000508)))


SHANK = dict(m=0.064, com=(0.0, 0.0, -0.209),
             I=((0.000245, 0, 0), (0, 0.000248, 0), (0, 0, 6e-06)))

LEGS = ("FL", "FR", "HL", "HR")
STAND_JOINTS = (0.0, -0.8, 1.6)   # abduct, thigh, knee (y-axis sign: -1)
STAND_HEIGHT = 0.29
EFFORT = 17.0
VEL_LIM = 40.0


def make_mini_cheetah() -> RobotModel:
    names = ["body"]
    parent = [0]
    jtrans = [np.zeros(3)]
    jaxis = [np.array([1.0, 0, 0])]
    inert = [(BODY["m"], np.array(BODY["com"]), np.array(BODY["I"]))]
    ee_link, ee_off, hip_link = [], [], []
    joint_names = []

    for leg in LEGS:
        front = leg[0] == "F"
        left = leg[1] == "L"
        sx = 1.0 if front else -1.0
        sy = 1.0 if left else -1.0

        ab_i = len(names)
        names.append(f"abduct_{leg}")
        parent.append(0)
        jtrans.append(np.array([sx * HIP_X, sy * HIP_Y, 0.0]))
        jaxis.append(np.array([1.0, 0.0, 0.0]))
        ab = _abduct(sy)
        inert.append((ab["m"], np.array(ab["com"]), np.array(ab["I"])))
        hip_link.append(ab_i)
        joint_names.append(f"torso_to_abduct_{leg.lower()}_j")

        th_i = len(names)
        names.append(f"thigh_{leg}")
        parent.append(ab_i)
        jtrans.append(np.array([0.0, sy * ABDUCT_TO_THIGH_Y, 0.0]))
        jaxis.append(np.array([0.0, -1.0, 0.0]))  # URDF axis "0 -1 0"
        th = _thigh(sy)
        inert.append((th["m"], np.array(th["com"]), np.array(th["I"])))
        joint_names.append(f"abduct_to_thigh_{leg.lower()}_j")

        sh_i = len(names)
        names.append(f"shank_{leg}")
        parent.append(th_i)
        jtrans.append(np.array([0.0, 0.0, -THIGH_LEN]))
        jaxis.append(np.array([0.0, -1.0, 0.0]))
        inert.append((SHANK["m"], np.array(SHANK["com"]),
                      np.array(SHANK["I"])))
        joint_names.append(f"thigh_to_knee_{leg.lower()}_j")

        ee_link.append(sh_i)
        ee_off.append(np.array([0.0, 0.0, -SHANK_TO_FOOT]))

    nj = len(names) - 1
    return RobotModel(
        parent=tuple(parent),
        ee_link=tuple(ee_link),
        hip_link=tuple(hip_link),
        ee_names=tuple(f"{leg}_FOOT" for leg in LEGS),
        joint_names=tuple(joint_names),
        joint_trans=np.stack(jtrans).astype(np.float32),
        joint_axis=np.stack(jaxis).astype(np.float32),
        mass=np.array([x[0] for x in inert], dtype=np.float32),
        com=np.stack([x[1] for x in inert]).astype(np.float32),
        inertia=np.stack([x[2] for x in inert]).astype(np.float32),
        ee_offset=np.stack(ee_off).astype(np.float32),
        joint_lower=np.full(nj, -2 * np.pi, dtype=np.float32),
        joint_upper=np.full(nj, 2 * np.pi, dtype=np.float32),
        effort_limit=np.full(nj, EFFORT, dtype=np.float32),
        velocity_limit=np.full(nj, VEL_LIM, dtype=np.float32),
    )


def stand_config() -> np.ndarray:
    q = [0.0, 0.0, STAND_HEIGHT, 0.0, 0.0, 0.0, 1.0]
    for _ in LEGS:
        q.extend(STAND_JOINTS)
    return np.array(q, dtype=np.float32)
