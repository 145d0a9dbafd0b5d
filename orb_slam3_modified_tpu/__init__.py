"""orb_slam3_modified_tpu — TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
lturing/ORB_SLAM3_modified (ORB-SLAM3 + fork extras). See SURVEY.md for the
reference feature inventory this framework covers.
"""
import jax

# SLAM geometry (3x3/6x6 solves, pose chains, Jacobians) needs true float32
# matmuls; TPU's default bf16-pass matmul precision loses ~1e-2 per product,
# which is fatal for pose accuracy. Hot kernels that tolerate low precision
# (e.g. descriptor distance) opt back down locally.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the SLAM step graphs are large and the TPU
# toolchain here compiles remotely (minutes); cache so each (shape, config)
# compiles once per machine, not once per process. Scoped per-platform:
# CPU AOT artifacts are machine-feature-sensitive and noisy to reload, so
# only the TPU path gets a persistent cache by default.
import os as _os

_platform = _os.environ.get("JAX_PLATFORMS", "")
if "cpu" not in _platform:
    _cache_dir = _os.environ.get(
        "ORB_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/orb_slam3_tpu_jax")
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
