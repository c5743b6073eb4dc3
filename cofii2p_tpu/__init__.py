"""CoFiI2P-TPU: a TPU-native image-to-point-cloud registration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CoFiI2P system (coarse-to-fine I2P registration: two-stream encoders, I2P
transformer fusion, coarse/fine correspondence prediction, EPnP-RANSAC pose
estimation), designed TPU-first:

- every shape static, every op jittable (reference: dynamic CPU preprocessing);
- the point pyramid + kNN maps are built **on device** inside the jitted step
  (reference builds them in 8 CPU DataLoader workers,
  /root/reference/model/kpconv/preprocess_data.py:36-107);
- EPnP-RANSAC is a vmapped on-device solver with zero host sync
  (reference: cv2.solvePnPRansac, /root/reference/evaluation/eval_all.py:107);
- data-parallel scale-out over ICI via jax.sharding Mesh + jit shardings
  (reference is strictly single-GPU batch-size-1).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the flagship programs (fused train step,
# eval pipeline) take tens of seconds to minutes to compile; cache them
# across processes.  Opt out with COFII2P_NO_COMPILE_CACHE=1.
if not _os.environ.get("COFII2P_NO_COMPILE_CACHE"):
    import jax as _jax

    # scope the cache by platform-affecting env so CPU and TPU artifacts
    # (compiled with different machine features) never mix
    import hashlib as _hashlib

    _env_key = _hashlib.md5(
        (
            _os.environ.get("JAX_PLATFORMS", "")
            + _os.environ.get("XLA_FLAGS", "")
            + _os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "")
        ).encode()
    ).hexdigest()[:8]
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", f"cofii2p_tpu_xla_{_env_key}"
        ),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
