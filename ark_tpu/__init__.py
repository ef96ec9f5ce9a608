"""ark_tpu — a TPU-native multiplexed-imaging analysis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of angelolab/ark-analysis
(reference layout: src/ark/{phenotyping,segmentation,analysis,spLDA,utils}).

Design stance (see SURVEY.md §7):
  * arrays-first core: pure functions over jnp arrays; pandas only at API edges
  * hot kernels (SOM BMU search, blur, segment reductions, pairwise distances)
    run as Pallas TPU kernels with XLA fallbacks for CPU test runs
  * cohort scale-out is FOV-sharded data parallelism over a jax.sharding.Mesh
  * disk IO isolated in ark_tpu.io with async host prefetch
"""

__version__ = "0.1.0"

from ark_tpu import settings  # noqa: F401
