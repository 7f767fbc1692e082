from multimodaldiscussiontransformer_tpu.core.registry import (  # noqa: F401
    DATASETS as DATASET_REGISTRY,
    register_dataset,
)
from multimodaldiscussiontransformer_tpu.data.preprocess import (  # noqa: F401
    cantor,
    preprocess_item,
    spatial_bucket_table,
)
from multimodaldiscussiontransformer_tpu.data.collator import (  # noqa: F401
    Batch,
    collate,
)
from multimodaldiscussiontransformer_tpu.data.trees import (  # noqa: F401
    tree_distance_pairs,
)
