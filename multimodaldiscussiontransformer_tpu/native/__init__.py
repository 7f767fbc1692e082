"""Native C++ host kernels (tree distances, Floyd-Warshall, spatial
bucketing) loaded via ctypes; auto-built from mdt_native.cc on first use."""

from multimodaldiscussiontransformer_tpu.native import loader  # noqa: F401
