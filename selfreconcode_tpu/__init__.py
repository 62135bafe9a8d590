"""SelfRecon-TPU: a TPU-native (JAX/XLA/Pallas) framework for self-supervised
clothed-human avatar reconstruction from monocular video.

Re-designed from scratch for TPU with the capabilities of the reference
SelfRecon implementation (CVPR 2022): canonical SDF template + non-rigid MLP
deformation + SMPL LBS skinning + differentiable mask/IDR rendering, optimized
per subject.

Architecture (all compute-path code is JAX/XLA/Pallas; static shapes, jit):
  - models/   neural fields (SDF, translator, render net), SMPL body model,
              LBS skinner
  - ops/      geometry kernels: trilinear sampling, marching cubes, sparse
              (octree) SDF evaluation, mesh & point rasterization
  - render/   camera model
  - engine/   surface root-finding w/ implicit differentiation, losses,
              train/infer steps
  - data/     scene dataset + per-frame learnable parameter banks
  - parallel/ device-mesh sharding helpers
"""

__version__ = "0.1.0"
