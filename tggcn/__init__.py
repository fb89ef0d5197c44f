"""tggcn — a TPU-native framework with the capabilities of the 2G-GCN reference.

This package re-implements, TPU-first (JAX / XLA / Pallas / pjit), everything the
reference PyTorch codebase (tanqiu98/2G-GCN) provides: the two-level recurrent
human-object-interaction models (2G-GCN / TGGCN and the CAD-120 / Bimanual
baselines), the three dataset pipelines (CAD-120, Bimanual Actions, MPHOI-72),
the multi-task loss bundles, the training / evaluation / analysis CLIs, and the
F1@k evaluation protocol.

Layout:
    tggcn.utils     pure numpy utilities (RLE, metrics, geometry, IO)
    tggcn.nn        JAX neural-net core (MLP, GRU scans, GeoGCN, messages, STE)
    tggcn.ops       Pallas TPU kernels + XLA reference implementations
    tggcn.models    model library (TGGCN, baselines) + registry
    tggcn.data      dataset loading + vectorised tensor assembly + bucketing
    tggcn.train     losses, multi-task loss learner, train loop, checkpointing
    tggcn.parallel  device mesh + sharding (data parallelism over ICI)
    tggcn.config    Hydra-style YAML config system (self-contained)
"""

__version__ = "0.1.0"
