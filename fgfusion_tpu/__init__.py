"""fgfusion_tpu — TPU-native framework for fine-grained feature-fusion
3D point-cloud registration.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`YHY138/Boosting-Fine-grained-Feature-Fusion-in-3D-Point-Cloud-Registration`
(REGTR-style registration with Res2Net fine-grained fusion inside the
KPConv backbone), built TPU-first:

- fixed static shapes everywhere (bucketed padding + validity masks)
- preprocessing (voxel-grid subsample, fixed-K radius search) on device,
  inside jit — no MinkowskiEngine / PyTorch3D / C++ host hops in the hot path
- batched masked Kabsch/SVD pose solve
- data-parallel scaling via jax.sharding.Mesh + jit shardings

Layout:
    ops/        device geometry kernels (voxel subsample, radius knn, pyramid)
    models/     flax modules (KPConv backbone, Res2Net fusion, transformer, RegTR)
    losses/     InfoNCE / circle / correspondence losses
    geometry/   SE(3)/SO(3) math (jnp + numpy), Kabsch, sinkhorn
    parallel/   mesh + sharding specs
    data/       numpy data pipeline (3DMatch / ModelNet / MCD), bucketing
    train/      trainer, checkpointing, schedulers, metrics
    benchmark/  evaluation protocols (3DMatch RR, ModelNet, DGR)
    utils/      config loader, logging, misc
"""

__version__ = "0.1.0"
