"""Host-side URDF parser -> RobotModel pytree.

Replaces the reference's Pinocchio URDF loading (mpc/models/model.cpp:14-37).
Runs once at model-build time on the host (nothing URDF-shaped belongs on
device).  Fixed joints are folded into their parent link: their child link's
inertia is transported into the parent frame and merged, and any end-effector
frames attached beyond fixed joints become (link, offset) pairs.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Sequence, Tuple

import numpy as np

from bilevel_gait_gen_tpu.models.rbd import RobotModel


def _vec(s: str | None, default=(0.0, 0.0, 0.0)) -> np.ndarray:
    if s is None:
        return np.array(default, dtype=np.float64)
    return np.array([float(x) for x in s.split()], dtype=np.float64)


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _parse_inertial(link_el) -> tuple[float, np.ndarray, np.ndarray]:
    inertial = link_el.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    mass = float(inertial.find("mass").get("value"))
    origin = inertial.find("origin")
    com = _vec(origin.get("xyz") if origin is not None else None)
    R = _rpy_matrix(_vec(origin.get("rpy") if origin is not None else None))
    it = inertial.find("inertia")
    I = np.array([
        [float(it.get("ixx")), float(it.get("ixy")), float(it.get("ixz"))],
        [float(it.get("ixy")), float(it.get("iyy")), float(it.get("iyz"))],
        [float(it.get("ixz")), float(it.get("iyz")), float(it.get("izz"))],
    ])
    return mass, com, R @ I @ R.T


def _merge_inertia(m1, c1, I1, m2, c2, I2):
    """Merge two bodies expressed in the same frame (inertias about own COMs)."""
    m = m1 + m2
    if m == 0.0:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    c = (m1 * c1 + m2 * c2) / m

    def shift(mi, ci, Ii):
        d = ci - c
        return Ii + mi * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    return m, c, shift(m1, c1, I1) + shift(m2, c2, I2)


def load_urdf(path_or_string: str, root_link: str | None = None,
              ee_frames: Sequence[str] = (),
              hip_joints: Sequence[str] = ()) -> RobotModel:
    """Parse a URDF into a RobotModel.

    ee_frames: names of (possibly fixed-joint) links to expose as end
    effectors; hip_joints: revolute joint names whose frames anchor the
    EE-box constraints (reference GetCOMToHip).
    """
    if path_or_string.strip().startswith("<"):
        root = ET.fromstring(path_or_string)
    else:
        root = ET.parse(path_or_string).getroot()

    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))
    child_to_joint = {j.find("child").get("link"): j for j in joints}
    parent_of = {j.find("child").get("link"): j.find("parent").get("link")
                 for j in joints}

    # find the root link (no parent joint)
    if root_link is None:
        candidates = [n for n in links if n not in parent_of]
        assert len(candidates) >= 1, "no root link found"
        root_link = candidates[0]

    # Identify movable chain: walk from root, collapsing fixed joints.
    # canonical[link] = (movable_link_name, R offset, p offset) of the movable
    # frame this link is rigidly attached to.
    canonical: Dict[str, tuple[str, np.ndarray, np.ndarray]] = {
        root_link: (root_link, np.eye(3), np.zeros(3))}
    movable_links: List[str] = [root_link]
    movable_parent: Dict[str, str] = {}
    movable_joint: Dict[str, ET.Element] = {}

    # BFS over joints in dependency order
    pending = joints[:]
    while pending:
        progressed = False
        rest = []
        for j in pending:
            par = j.find("parent").get("link")
            child = j.find("child").get("link")
            if par not in canonical:
                rest.append(j)
                continue
            progressed = True
            base, Rb, pb = canonical[par]
            o = j.find("origin")
            xyz = _vec(o.get("xyz") if o is not None else None)
            R_origin = _rpy_matrix(_vec(o.get("rpy") if o is not None else None))
            if j.get("type") in ("fixed",):
                canonical[child] = (base, Rb @ R_origin, pb + Rb @ xyz)
            else:
                movable_links.append(child)
                movable_parent[child] = base
                movable_joint[child] = j
                canonical[child] = (child, np.eye(3), np.zeros(3))
        pending = rest
        if not progressed:
            break

    # Accumulate inertias of all links into their canonical movable link.
    agg = {n: (0.0, np.zeros(3), np.zeros((3, 3))) for n in movable_links}
    for name, el in links.items():
        if name not in canonical:
            continue
        base, R, p = canonical[name]
        m, c, I = _parse_inertial(el)
        c_b = p + R @ c
        I_b = R @ I @ R.T
        agg[base] = _merge_inertia(*agg[base], m, c_b, I_b)

    index = {n: i for i, n in enumerate(movable_links)}
    L = len(movable_links)
    parent_idx = [0] * L
    jtrans = np.zeros((L, 3))
    jaxis = np.zeros((L, 3))
    jaxis[:, 0] = 1.0
    lower, upper, effort, vel = [], [], [], []
    for name in movable_links[1:]:
        i = index[name]
        j = movable_joint[name]
        par_name = movable_parent[name]
        parent_idx[i] = index[par_name]
        # joint origin relative to the canonical parent frame
        gp = j.find("parent").get("link")
        _, Rg, pg = canonical[gp]
        o = j.find("origin")
        xyz = _vec(o.get("xyz") if o is not None else None)
        R_origin = _rpy_matrix(_vec(o.get("rpy") if o is not None else None))
        if not np.allclose(R_origin, np.eye(3), atol=1e-9) or \
           not np.allclose(Rg, np.eye(3), atol=1e-9):
            # support only translation offsets for now (A1/Adam/mini-cheetah
            # URDFs use rpy="0 0 0" on movable joints)
            R_total = Rg @ R_origin
            assert np.allclose(R_total, np.eye(3), atol=1e-6), (
                f"rotated joint origins not supported yet (joint {j.get('name')})")
        jtrans[i] = pg + Rg @ xyz
        a = j.find("axis")
        jaxis[i] = _vec(a.get("xyz") if a is not None else (1, 0, 0))
        lim = j.find("limit")
        lower.append(float(lim.get("lower", "-1e9")) if lim is not None else -1e9)
        upper.append(float(lim.get("upper", "1e9")) if lim is not None else 1e9)
        effort.append(float(lim.get("effort", "1e9")) if lim is not None else 1e9)
        vel.append(float(lim.get("velocity", "1e9")) if lim is not None else 1e9)

    mass = np.array([agg[n][0] for n in movable_links])
    com = np.stack([agg[n][1] for n in movable_links])
    inertia = np.stack([agg[n][2] for n in movable_links])

    ee_link, ee_off = [], []
    for f in ee_frames:
        base, R, p = canonical[f]
        ee_link.append(index[base])
        ee_off.append(p)

    hip_link = []
    jname_to_child = {j.get("name"): j.find("child").get("link") for j in joints}
    for hj in hip_joints:
        child = jname_to_child[hj]
        hip_link.append(index[canonical[child][0]])

    return RobotModel(
        parent=tuple(parent_idx),
        ee_link=tuple(ee_link),
        hip_link=tuple(hip_link),
        ee_names=tuple(ee_frames),
        joint_names=tuple(movable_joint[n].get("name")
                          for n in movable_links[1:]),
        joint_trans=np.asarray(jtrans, dtype=np.float32),
        joint_axis=np.asarray(jaxis, dtype=np.float32),
        mass=np.asarray(mass, dtype=np.float32),
        com=np.asarray(com, dtype=np.float32),
        inertia=np.asarray(inertia, dtype=np.float32),
        ee_offset=np.asarray(np.stack(ee_off) if ee_off else np.zeros((0, 3)),
                             dtype=np.float32),
        joint_lower=np.asarray(lower, dtype=np.float32),
        joint_upper=np.asarray(upper, dtype=np.float32),
        effort_limit=np.asarray(effort, dtype=np.float32),
        velocity_limit=np.asarray(vel, dtype=np.float32),
    )
