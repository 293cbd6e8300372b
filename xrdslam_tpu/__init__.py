"""xrdslam_tpu — a TPU-native neural-SLAM framework.

A from-scratch rebuild of the capabilities of openxrlab/xrdslam on
JAX/XLA/Pallas: the same `ds-run` / `ds-eval` / `ds-viewer` CLI surface,
dataclass config registry, and Algorithm/Model plugin architecture, but with
tracking/mapping optimization as jit-compiled `lax.scan` device loops, all
map structures as fixed-capacity static-shape tables, and the reference's
CUDA extensions replaced by Pallas/JAX kernels.
"""

__version__ = "0.1.0"
