"""Native runtime tests: triple buffer, rate loop, LPF, UDP loopback.

Covers the reference's concurrency/hardware plumbing equivalents
(controllers/mpc_controller.h mutex handoff, LoopFunc threads,
HardwareRobot::LPF, unitree UDP).
"""
import threading
import time

import numpy as np
import pytest

from bilevel_gait_gen_tpu import runtime


def test_triple_buffer_latest_value():
    tb = runtime.TripleBuffer(4)
    out, fresh = tb.read()
    assert not fresh
    tb.write(np.array([1.0, 2, 3, 4]))
    out, fresh = tb.read()
    assert fresh
    np.testing.assert_array_equal(out, [1, 2, 3, 4])
    out, fresh = tb.read()
    assert not fresh  # no new publish
    np.testing.assert_array_equal(out, [1, 2, 3, 4])
    tb.write(np.array([5.0, 6, 7, 8]))
    tb.write(np.array([9.0, 10, 11, 12]))  # overwrites, reader sees latest
    out, fresh = tb.read()
    assert fresh
    np.testing.assert_array_equal(out, [9, 10, 11, 12])


def test_triple_buffer_concurrent():
    """Producer at full speed, consumer sampling: consumer always sees a
    complete (x, x+0.5) pair — no torn reads."""
    tb = runtime.TripleBuffer(2)
    # seed a valid pair: a never-written buffer reads all-zeros, and under
    # load the first consumer read can beat the producer thread's first
    # write (observed as a suite-only flake)
    tb.write(np.array([0.0, 0.5]))
    stop = threading.Event()
    errors = []

    def producer():
        i = 0
        while not stop.is_set():
            tb.write(np.array([float(i), float(i) + 0.5]))
            i += 1

    th = threading.Thread(target=producer)
    th.start()
    try:
        t_end = time.time() + 0.5
        while time.time() < t_end:
            out, _ = tb.read()
            if out[1] != out[0] + 0.5:
                errors.append(out.copy())
    finally:
        stop.set()
        th.join()
    assert not errors, errors[:5]


def test_rate_loop_timing():
    rl = runtime.RateLoop(0.002)  # 500 Hz
    t0 = time.perf_counter()
    for _ in range(50):
        rl.wait()
    elapsed = time.perf_counter() - t0
    assert 0.07 < elapsed < 0.2, elapsed
    assert rl.ticks == 50


def test_lpf_convergence_and_cutoff():
    f = runtime.LowPassBank(3, cutoff_hz=10.0, sample_hz=1000.0)
    x = np.array([1.0, -2.0, 3.0])
    y = f.step(x)
    np.testing.assert_array_equal(y, x)  # initialized to first sample
    f2 = runtime.LowPassBank(1, cutoff_hz=10.0, sample_hz=1000.0)
    f2.step(np.zeros(1))
    for _ in range(2000):
        y = f2.step(np.ones(1))
    np.testing.assert_allclose(y, 1.0, atol=1e-6)  # DC gain 1


def test_udp_loopback():
    a = runtime.UdpEndpoint("127.0.0.1", 47801, "127.0.0.1", 47802)
    b = runtime.UdpEndpoint("127.0.0.1", 47802, "127.0.0.1", 47801)
    msg = b"\x01\x02state-packet\x03"
    assert a.send(msg) == len(msg)
    time.sleep(0.05)
    got = b.recv()
    assert got == msg
    assert b.recv() is None  # nonblocking empty
