from vae_song_tpu.models.flexible import (
    FlexibleVAE,
    NaiveAE,
    VanillaVAE,
    LRVAE,
    DATASET_DEFAULTS,
    resolve_dataset_defaults,
)
from vae_song_tpu.models.lidvae import LIDVAE
from vae_song_tpu.models.setvae import (
    SetVAE,
    SetLRVAE,
    SetEncoder,
    SetEncoderAttn,
    SetDecoder,
    SetDecoderAttn,
)
from vae_song_tpu.models.registry import build_model

__all__ = [
    "FlexibleVAE",
    "NaiveAE",
    "VanillaVAE",
    "LRVAE",
    "LIDVAE",
    "SetVAE",
    "SetLRVAE",
    "SetEncoder",
    "SetEncoderAttn",
    "SetDecoder",
    "SetDecoderAttn",
    "DATASET_DEFAULTS",
    "resolve_dataset_defaults",
    "build_model",
]
