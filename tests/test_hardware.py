"""Hardware layer tests: packet framing, estimator LPF chain, torque check,
gain schedule, full loopback control tick.

Reference analogs: hardware/hardware_robot.cpp (ControlCallback, LPF,
VerifyControlAction, AssignMPCGains) exercised against a simulated robot on
the loopback UDP link.
"""
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
