"""rdfc_gan_tpu — a TPU-native (JAX/Flax/Pallas) depth-completion framework.

Ground-up rebuild of the capabilities of midea-ai/RDFC-GAN (RDF-GAN, CVPR 2022
and RDFC-GAN, TPAMI 2024): RGB + sparse/incomplete depth -> dense indoor depth,
trained as a (Cycle)GAN with surface-normal and semantic-label guidance.

Design (TPU-first, not a port):
  * NHWC layouts, bfloat16 matmul/conv compute with float32 parameters.
  * Functional engines: one jitted ``train_step(state, batch, rng)`` per GAN
    engine instead of mutable optimizer/requires_grad juggling.
  * NLSPN non-local propagation as ``lax.scan`` over a fused deformable-gather
    step (Pallas kernel on TPU, pure-XLA fallback everywhere).
  * Data parallelism via ``jax.sharding.Mesh`` + NamedSharding; XLA emits the
    collectives (psum of grads/losses) — no hand-written process groups.
"""

__version__ = "0.1.0"

from . import registry  # noqa: F401
