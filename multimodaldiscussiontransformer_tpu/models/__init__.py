"""Flax model layer: BERT/ViT towers, bottleneck fusion, graphormer blocks,
and the full Multi-Modal Discussion Transformer.

TPU-native redesign of the reference model layer
(mDT/src/modules/*.py, mDT/src/models/multi_modal_discussion_transformer.py):
static-capacity buffers + index-based gather/scatter replace dynamic boolean
indexing; bf16 compute with f32 params replaces fp16 hacks; the graph
attention can run through a Pallas fused kernel.
"""

from multimodaldiscussiontransformer_tpu.models.mdt import (  # noqa: F401
    MDTModel,
    MDTOutput,
    MultiGraphormerGraphEncoder,
)
