"""bilevel_gait_gen_tpu: a TPU-native bilevel-MPC gait-generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ codebase ``Zolkin1/bilevel-gait-gen`` ("Real-Time Iterations for Bilevel
Optimization With Application to Locomotion Gait Generation"): an inner convex
QP (linearized single-rigid-body MPC over spline-parameterized contact forces
and foot positions) and an outer non-convex optimization over contact/switching
times, differentiated through the inner QP with implicit-function-theorem
adjoints.

Design stance (vs. the reference's mutation-heavy C++ object graph):

* every component is a pure function over fixed-shape pytrees; variable-size
  structures (spline topology, constraint counts) become fixed slots + masks;
* linearizations and every derivative w.r.t. contact times come from
  ``jax.jacfwd`` / ``jax.grad`` on those pure functions (replacing ~2k LoC of
  hand-written partials in the reference);
* the inner QP is solved by a dense *condensed* predictor-corrector
  interior-point method: states are eliminated by a `lax.scan`, so one solver
  iteration is a handful of batched matmuls -> MXU-friendly and trivially
  `vmap`-/`pjit`-batched over thousands of scenarios;
* the control loop is a scanned carry; scenario batches shard over a device
  mesh with `jax.sharding`.
"""

__version__ = "0.1.0"
