"""splatco_tpu — TPU-native structure-view collaborative 3D Gaussian Splatting.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SCUT-BIP-Lab/SplatCo (reference: /root/reference): anchor-based
(Scaffold-GS-style) Gaussian splatting with

  * CSCM  — cross-structure collaboration (multi-level tri-plane + local
            context fusion),
  * SVC   — structure-view co-learning (multi-view batched rendering with a
            single aggregated backward),
  * CVPM  — cross-view pruning of geometrically inconsistent anchors,

re-architected TPU-first: a Pallas tile rasterizer with analytic gradients,
fixed-capacity padded anchor state that stays `jit`-compatible under
densification, and `jax.sharding`-based scale-out (views data-parallel,
anchors sharded, tri-plane/MLP params replicated with psum'd grads).
"""

__version__ = "0.1.0"

from splatco_tpu import ops  # noqa: F401
