"""GPEMSR-TPU: a TPU-native (JAX/XLA/Pallas) framework for generative-prior
electron-microscopy super-resolution and downstream segmentation evaluation.

Re-designed from scratch for TPU hardware with the capability surface of the
GPEMSR reference (CVPR 2024): VQGAN generative prior, LR->codebook Indexer,
multi-frame SR network with flow-guided deformable alignment, 3-stage training,
tiled 3-D segmentation inference (Superhuman/MALA affinity U-Nets), watershed +
mean-affinity agglomeration, and VOI/ARAND metrics.

Layout:
  core/      config dataclasses, PRNG discipline, checkpointing, logging
  ops/       TPU compute ops (resize, warp, deformable conv, VQ, patches)
  models/    flax modules (VQGAN stack, SpyNet, VGG19, GPEMSR, seg U-Nets)
  data/      EM-stack datasets, samplers, augmentation
  train/     stage-1/2/3 training recipes (pjit data-parallel)
  infer/     SR inference + tiled 3-D overlap-blend provider
  seg/       affinity generation, watershed/agglomeration (C++), VOI/ARAND
  parallel/  device mesh + sharding helpers
  utils/     image metrics and IO helpers
"""

__version__ = "0.1.0"
