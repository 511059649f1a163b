"""Hardware layer tests: packet framing, estimator LPF chain, torque check,
gain schedule, full loopback control tick.

Reference analogs: hardware/hardware_robot.cpp (ControlCallback, LPF,
VerifyControlAction, AssignMPCGains) exercised against a simulated robot on
the loopback UDP link.
"""
import time

import numpy as np

from bilevel_gait_gen_tpu import runtime
from bilevel_gait_gen_tpu.control import hardware as hw


def test_packet_roundtrip():
    nj = 12
    rng = np.random.default_rng(0)
    q, dq, tau = rng.standard_normal((3, nj))
    quat = np.array([0, 0, 0, 1.0])
    gyro = rng.standard_normal(3)
    acc = rng.standard_normal(3)
    pkt = hw.pack_state(7, q, dq, tau, quat, gyro, acc)
    seq, q2, dq2, tau2, quat2, gyro2, acc2 = hw.unpack_state(pkt, nj)
    assert seq == 7
    np.testing.assert_allclose(q2, q.astype(np.float32))
    np.testing.assert_allclose(gyro2, gyro.astype(np.float32))
    # garbage rejected
    assert hw.unpack_state(b"\x00" * 64, nj) is None


def test_estimator_filters():
    est = hw.StateEstimator(12, hw.EstimatorConfig())
    # constant velocity motion -> vcom converges to the true velocity
    v_true = np.array([0.5, -0.2, 0.0])
    t = 0.0
    for k in range(500):
        t = k / 240.0
        est.mocap_update(v_true * t, t)
    np.testing.assert_allclose(est.vcom, v_true, atol=1e-3)


def test_verify_torques():
    tau = np.array([1.0, np.nan, 50.0, -np.inf])
    out = hw.verify_torques(tau, 33.5)
    np.testing.assert_allclose(out, [1.0, 0.0, 33.5, 0.0])


def test_gain_schedule():
    gs = hw.GainSchedule()
    contact = np.array([True, False, True, False])
    kp, kd = gs.gains(contact)
    assert kp.shape == (12,)
    assert kp[0] == gs.kp_stance and kp[3] == gs.kp_swing


def test_loopback_control_tick():
    """Simulated robot over loopback UDP: state in -> command out."""
    nj = 12
    robot_side = runtime.UdpEndpoint("127.0.0.1", 48811, "127.0.0.1", 48812)
    host_side = runtime.UdpEndpoint("127.0.0.1", 48812, "127.0.0.1", 48811)

    calls = {}

    def control_fn(q, dq, quat, gyro, vcom, t, mode):
        calls["q"] = q
        tau = 0.1 * np.arange(nj)
        return tau, q, np.zeros(nj), np.array([True] * 4)

    bot = hw.HardwareRobot(nj, host_side, control_fn)
    bot.set_mode(hw.Mode.MPC)

    q = np.linspace(0, 1, nj)
    robot_side.send(hw.pack_state(1, q, np.zeros(nj), np.zeros(nj),
                                  np.array([0, 0, 0, 1.0]), np.zeros(3),
                                  np.zeros(3)))
    import time
    time.sleep(0.05)
    assert bot.step_once(0.0)
    np.testing.assert_allclose(calls["q"], q.astype(np.float32))
    time.sleep(0.05)
    cmd = robot_side.recv(4096)
    assert cmd is not None
    import struct
    magic, kind, seq = struct.unpack_from("<HHI", cmd, 0)
    assert magic == hw.MAGIC and kind == hw.KIND_COMMAND
    payload = np.frombuffer(cmd, np.float32, offset=8).reshape(nj, 5)
    np.testing.assert_allclose(payload[:, 4], 0.1 * np.arange(nj), atol=1e-6)


def test_estimator_acom_and_grf():
    """a_com converges for constant acceleration; GRF chain low-passes
    (reference LPF cutoffs hardware_robot.cpp:153-180)."""
    est = hw.StateEstimator(12, hw.EstimatorConfig())
    a_true = np.array([0.3, 0.0, -0.1])
    for k in range(2000):
        t = k / 240.0
        est.mocap_update(0.5 * a_true * t * t, t)
    np.testing.assert_allclose(est.acom, a_true, atol=2e-2)
    # GRF: step input converges to the step value
    raw = np.tile([0.0, 0.0, 33.0], 4)
    for _ in range(2000):
        out = est.grf_update(raw)
    np.testing.assert_allclose(out, raw, atol=1e-3)
    np.testing.assert_allclose(est.grf, raw, atol=1e-3)


def test_stand_ramp_state_machine():
    """Stand mode ramps q_des from the captured config to the stand config
    over stand_time (reference hardware_robot.cpp:190-199), and a rejected
    MPC action falls back to Stand (:281-292)."""
    nj = 12
    a = runtime.UdpEndpoint("127.0.0.1", 48821, "127.0.0.1", 48822)
    b = runtime.UdpEndpoint("127.0.0.1", 48822, "127.0.0.1", 48821)

    q_stand = np.linspace(0.1, 1.2, nj)

    def failing_control(*args):
        raise RuntimeError("solver rejected")

    robot = hw.HardwareRobot(nj, a, failing_control,
                             stand_config=q_stand, stand_time=0.5)
    robot.set_mode(hw.Mode.STAND)
    q0 = np.zeros(nj)

    def tick(t):
        b.send(hw.pack_state(1, q0, np.zeros(nj), np.zeros(nj),
                             np.array([0, 0, 0, 1.0]), np.zeros(3),
                             np.zeros(3)))
        assert robot.step_once(t)
        pkt = None
        for _ in range(200):
            pkt = b.recv(4096)
            if pkt is not None:
                break
            time.sleep(0.005)
        assert pkt is not None
        import struct
        payload = np.frombuffer(pkt[8:], np.float32).reshape(nj, 5)
        return payload[:, 0]         # q_des column (interleaved layout)

    qd_mid = tick(0.25)              # entry captured at t=0.25 -> ratio 0
    np.testing.assert_allclose(qd_mid, q0, atol=1e-6)
    qd_half = tick(0.5)              # ratio 0.5
    np.testing.assert_allclose(qd_half, 0.5 * q_stand, atol=1e-5)
    qd_done = tick(2.0)              # ratio 1
    np.testing.assert_allclose(qd_done, q_stand, atol=1e-5)

    # MPC mode with a rejecting controller -> falls back to Stand
    robot.set_mode(hw.Mode.MPC)
    tick(3.0)
    assert robot.mode == hw.Mode.STAND


def test_mpc_over_udp_standing():
    """End-to-end MPC-over-UDP: the full hardware stack (estimator,
    state machine, wire format, motor PD law) against simulated physics
    (reference hardware_interface.cpp against the real A1).  Subprocess at
    production f32 precision."""
    import os
    import subprocess
    import sys as _sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [_sys.executable, os.path.join(root, "scripts",
                                       "hardware_sim_demo.py"),
         "1.5", "--cpu"],
        capture_output=True, text=True, timeout=560, env=env, cwd=root)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "UPRIGHT" in proc.stdout
