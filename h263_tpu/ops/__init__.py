"""Reconstruction ops: golden numpy oracles + JAX/Pallas TPU kernels.

Every op ships in (up to) three forms:
  * golden_*  — numpy, scalar-faithful to the reference's arithmetic
                (including f32 accumulation order); the parity oracle.
  * *_jnp     — jittable jnp implementation, bit-exact to golden.
  * *_pallas  — hand-written Pallas TPU kernel for the hot path.
"""
