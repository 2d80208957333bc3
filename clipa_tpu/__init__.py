"""CLIPA-TPU: a TPU-native CLIPA (inverse-scaling CLIP) training framework.

Built from scratch for JAX/XLA/Pallas on TPU. Capability reference:
UCSC-VLAA/CLIPA (see /root/repo/SURVEY.md for the full inventory).

Design stance (vs. the reference):
  * one jit-compiled SPMD program over a ``jax.sharding.Mesh`` (no pmap),
  * Pallas kernels for hot ops (flash attention, fused normalize+patchify,
    chunked global InfoNCE),
  * a TF-free host data path (own TFRecord reader + C++ decode pool),
  * Orbax sharded checkpoints with a flat-npz export kept for parity with
    released CLIPA weights.
"""

__version__ = "0.1.0"

from clipa_tpu.config import ConfigDict, parse_arg  # noqa: F401
