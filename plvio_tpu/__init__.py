"""plvio_tpu — TPU-native point-line visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bing164/PL-VI-ORBSLAM3 (an ORB-SLAM3 fork with line features and a
prior-map relocalization thread).  This is NOT a port: the compute path is
batched, fixed-shape, jit-compiled device code; the branchy SLAM state
machine runs on host.

Subpackages
-----------
utils     Lie groups (SO3/SE3/Sim3), masked-array helpers, config.
io        EuRoC/TUM dataset loaders, trajectory writers, ATE/RPE evaluation,
          synthetic world generation for tests/benchmarks.
ops       Device kernels: camera models, image pyramid, FAST/ORB extraction,
          line detection + LBD descriptors, Hamming matching, IMU
          preintegration, triangulation, RANSAC.  `ops.pallas` holds
          hand-written TPU kernels for the hot ops.
solver    The single masked Gauss-Newton/Levenberg-Marquardt engine with
          Schur-complement reduction that replaces the reference's ~40
          bespoke g2o optimizers (reference: src/Optimizer.cc).
models    The SLAM pipeline: map store (struct-of-arrays Atlas), tracking,
          local mapping, loop closing, relocalization, BoW vocabulary,
          System public API (reference: src/System.cc, src/Tracking.cc, ...).
parallel  Device-mesh scale-out: sharded front end, distributed BA.
native    C++ runtime components (inverted index, dataset prefetcher).
"""

__version__ = "0.1.0"

# SLAM geometry prefers true f32 matmuls: on standard TPU backends JAX's
# default matmul precision truncates f32 operands to bfloat16 on the MXU
# (~0.4% relative error in pose products / normal equations).  Set
# PLVIO_MATMUL_PRECISION=highest to force exact f32 (costs multi-pass
# matmuls in the conv-heavy front end).  The dev-tunnel backend used for
# CI benchmarking computes small f32 contractions exactly either way, so
# the default stays "default" for speed; the geometry-critical solver
# kernels are additionally robust to this via their IRLS re-gating.
import os as _os

if _os.environ.get("PLVIO_MATMUL_PRECISION"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision",
                       _os.environ["PLVIO_MATMUL_PRECISION"])
