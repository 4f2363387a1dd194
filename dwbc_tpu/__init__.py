"""dwbc_tpu — a TPU-native whole-body loco-manipulation RL framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Deep-Whole-Body-Control (CoRL 2022): batched articulated rigid-body
simulation, whole-body task environments (legged locomotion + arm EE
tracking), dual-advantage PPO with Regularized Online Adaptation, and
SPMD scaling over TPU meshes.

Design stance (vs. the CUDA/torch reference at /root/reference):
  * the simulator is a pure function over a state pytree, not an object
    mutating GPU buffers through an FFI;
  * envs are a vmapped/sharded batch dimension; rollouts are lax.scan;
  * the PPO update is a single pjit'd function with psum reductions.
"""

__version__ = "0.1.0"
