"""spatialalignmentnetwork_tpu — TPU-native (JAX/XLA/Pallas) framework for
multi-modal MRI reconstruction assisted with spatial alignment.

A ground-up reimplementation of the capabilities of
woxuankai/SpatialAlignmentNetwork (Xuan et al., IEEE TMI 2022) designed for
TPU hardware: pure-functional models (flax), jitted train steps, XLA FFTs,
Pallas kernels for the sampling/window-loss hot ops, and pjit/shard_map data
parallelism over device meshes.

Layout:
    ops/       signal primitives (fft, rss, crop), k-space masks,
               grid sampling, window losses (SSIM/LNCC/MI)
    models/    network definitions (VarNet, spatial transformer, GAN, UNets)
    data/      paired-volume h5 pipeline + augmentation
    engine/    configs, checkpoints, the CSModel orchestrator, train loops
    parallel/  mesh construction and sharded train steps
    utils/     eval metrics, profiling helpers
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "CSModel":
        from .engine.csmodel import CSModel

        return CSModel
    if name == "Config":
        from .engine.config import Config

        return Config
    raise AttributeError(name)
