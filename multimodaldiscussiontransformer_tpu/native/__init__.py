from multimodaldiscussiontransformer_tpu.native import loader  # noqa: F401
