"""equss_tpu — TPU-native framework for Expand-and-Quantize Unsupervised
Semantic Segmentation (EQUSS, AAAI 2024, arXiv:2312.07342).

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference PyTorch repo (pitlover/Expand-and-Quantize-for-Unsupervised-
Semantic-Segmentation): frozen DINO ViT dense features -> expansion head
-> product quantization -> cluster/linear probes with Hungarian-matched
mIoU and dense-CRF refinement.

Layout:
  core/      config, PRNG, checkpointing, logging
  models/    Flax DINO ViT, heads, EQUSS + variant models, registry
  ops/       quantizers (jnp + Pallas fused kernels), k-means, CRF, kNN
  losses/    STEGO correspondence, JSD, InfoNCE, entropy, Sinkhorn, ...
  eval/      probes, confusion/Hungarian metrics, evaluator
  data/      datasets, transforms, input pipeline, offline jobs
  parallel/  device mesh, sharding, collectives
  train/     builders, train/valid loops
"""

__version__ = "0.1.0"
