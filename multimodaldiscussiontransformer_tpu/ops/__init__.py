"""Device ops: Pallas TPU kernels + XLA reference implementations.

The performance-critical op is the bias-augmented tree attention the
reference leaves to stock torch bmm (mDT/src/modules/multihead_attention.py:
168-199); here it is a fused Pallas kernel (biased_attention.py) with an XLA
fallback used on CPU and for parity testing.
"""

from multimodaldiscussiontransformer_tpu.ops.biased_attention import (  # noqa: F401
    biased_attention,
    biased_attention_reference,
)
