"""multimodaldiscussiontransformer_tpu — a TPU-native rebuild of the
Multi-Modal Discussion Transformer (mDT, AAAI 2024).

A brand-new JAX/XLA/Pallas framework providing the full capability surface of
the reference PyTorch/FairSeq system (liamhebert/MultiModalDiscussionTransformer):
graph-transformer over discussion trees with BERT text towers, ViT image
towers, and learned bottleneck-token fusion — redesigned TPU-first:

- static bucketed shapes instead of per-batch dynamic padding
- capacity-based gather/scatter instead of boolean-mask flattening
- bf16 compute / f32 params instead of fp16 hacks
- jit-compiled train step over a `jax.sharding.Mesh` (dp x tp) instead of DDP
- Pallas fused biased tree-attention for the hot path
- a native C++ host-side graph-preprocessing library (tree distances,
  Floyd–Warshall APSP, Cantor spatial bucketing)

Subpackages
-----------
core      config tree, named registries, metrics, mesh/dtype policy
data      host-side pipeline: tree distances, preprocess, bucketed collator
models    Flax modules: BERT/ViT towers, fusion, graphormer, full mDT
ops       Pallas kernels + XLA reference ops (biased attention, APSP)
losses    node_cross_entropy, contrastive_loss criteria
tasks     node_prediction, contrastive_learning tasks
train     trainer loop, optimizer recipe, Orbax checkpointing
parallel  mesh/axis definitions, sharding rules, collectives
serve     incremental (re-scoring) inference API
"""

__version__ = "0.1.0"

from multimodaldiscussiontransformer_tpu.core import registry  # noqa: F401
