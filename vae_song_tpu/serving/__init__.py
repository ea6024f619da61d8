"""Serving-path utilities (generation/inference beyond the reference).

The reference's serving story is test.py's z -> decode loop on one GPU;
this package adds TPU-native inference optimizations on top of the same
checkpoint + config surface: post-training int8 quantization of the
dense layers (quant.py) for the MXU's double-rate int8 path.
"""

from vae_song_tpu.serving.quant import (  # noqa: F401
    int8_dense,
    make_quantized_decode,
    quantize_dense_params,
)
