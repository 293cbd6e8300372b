"""xrdslam_tpu — a TPU-native neural-SLAM framework.

A from-scratch rebuild of the capabilities of openxrlab/xrdslam on
JAX/XLA/Pallas: the same `ds-run` / `ds-eval` / `ds-viewer` CLI surface,
dataclass config registry, and Algorithm/Model plugin architecture, but with
tracking/mapping optimization as jit-compiled `lax.scan` device loops, all
map structures as fixed-capacity static-shape tables, and the reference's
CUDA extensions replaced by Pallas/JAX kernels.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: mapping/tracking programs are large
# (unrolled multi-level encoders + their backward) and compile in ~30-100 s
# on the TPU; the cache makes every later process start instantly.
_cache_dir = _os.environ.get("XRDSLAM_JAX_CACHE", _os.path.expanduser("~/.cache/xrdslam_jax"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # older jax without these options
    pass
