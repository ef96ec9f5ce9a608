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

import os as _os
import sys as _sys

_CACHE_OFF = ("0", "", "false", "off", "no")


def _default_compile_cache():
    """Enable JAX's persistent compilation cache unless configured away.

    Pipeline programs (Mesmer forward, fused pixel pipeline, SOM scans)
    cost 30 s-10 min each to compile on remote-compile TPU attaches; with
    the cache, a fresh-process cohort run drops from minutes of compiles
    to seconds (measured: the pixel-clustering template end-to-end on a
    TPU attach went 222 s -> 7.7 s). Precedence: an explicit
    JAX_COMPILATION_CACHE_DIR (jax's own env var) or a prior
    jax.config.update always wins; ARK_TPU_XLA_CACHE=0/false/off/no (or
    empty) disables, any other value overrides the default path
    (~/.cache/ark_tpu/xla_cache). Cache keys include platform + compile
    options, so CPU/TPU runs never collide.

    Importing ark_tpu must NOT import jax itself: users (and this repo's
    own conftest) rely on setting JAX_PLATFORMS/XLA_FLAGS between
    `import ark_tpu` and their first jax import, and an eager jax import
    would bake the session defaults in. So: if jax is already loaded
    (e.g. via sitecustomize), set the config directly; otherwise seed
    jax's own env var, which jax reads whenever it is first imported."""
    knob = _os.environ.get("ARK_TPU_XLA_CACHE")
    if knob is not None and knob.strip().lower() in _CACHE_OFF:
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    path = knob or _os.path.join(
        _os.path.expanduser("~"), ".cache", "ark_tpu", "xla_cache")
    try:
        _os.makedirs(path, exist_ok=True)
    except OSError:  # read-only home etc. — cache is best-effort
        return
    if "jax" in _sys.modules:
        jax = _sys.modules["jax"]
        if not jax.config.jax_compilation_cache_dir:  # app config wins
            jax.config.update("jax_compilation_cache_dir", path)
    else:
        _os.environ["JAX_COMPILATION_CACHE_DIR"] = path


_default_compile_cache()

from ark_tpu import settings  # noqa: F401,E402
