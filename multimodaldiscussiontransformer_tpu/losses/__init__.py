"""Criterions: node cross-entropy and discussion contrastive loss.

Pure-functional re-implementations of the reference criterions
(mDT/src/criterions/hatespeech_loss.py, contrastive_loss.py) returning
``(loss, sample_size, logging_output)`` with the same summable-logging
contract: every logging value is a scalar that can be summed across
data-parallel shards before metric reduction
(hatespeech_loss.py:175-182, contrastive_loss.py:220-227).
"""

from multimodaldiscussiontransformer_tpu.losses.node_cross_entropy import (  # noqa: F401
    node_cross_entropy_loss,
    reduce_node_metrics,
)
from multimodaldiscussiontransformer_tpu.losses.contrastive_loss import (  # noqa: F401
    contrastive_loss,
    reduce_contrastive_metrics,
)
