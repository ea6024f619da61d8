"""Model construction from (experiment_type, config dict) — the
dispatch mirror of main.py:422-580 and test.py:33-100."""

from vae_song_tpu.models.flexible import NaiveAE, VanillaVAE, LRVAE
from vae_song_tpu.models.lidvae import LIDVAE
from vae_song_tpu.models.setvae import SetVAE, SetLRVAE

EXPERIMENT_TYPES = ("lidvae", "vae", "nae", "lrvae", "setvae", "setlrvae")


def _tup(x):
    return tuple(x) if x is not None else None


def build_model(
    exp_type: str,
    dataset: str,
    model_params: dict,
    beta: float = 1.0,
    alpha: float = 0.01,
    il: float = 0.0,
):
    """Build one model instance for a given sweep point."""
    mp = model_params
    hchans = _tup(mp.get("hchans")) or None
    if hchans is not None and len(hchans) == 0:
        hchans = None

    if exp_type == "lidvae":
        return LIDVAE.for_dataset(
            dataset,
            hidden_channels=hchans,
            is_log_mse=mp.get("log_mse", False),
            inverse_lipschitz=il,
            beta=beta,
        )
    if exp_type == "vae":
        return VanillaVAE.for_dataset(
            dataset,
            hidden_channels=hchans,
            beta=beta,
            encoder_type=mp.get("encoder_type", "conv"),
            decoder_type=mp.get("decoder_type", "mlp"),
            fixed_var=mp.get("fixed_var", False),
            residual_connection=mp.get("residual_connection", False),
            mixed_precision=mp.get("mixed_precision", False),
        )
    if exp_type == "nae":
        return NaiveAE.for_dataset(
            dataset,
            hidden_channels=hchans,
            encoder_type=mp.get("encoder_type", "conv"),
            decoder_type=mp.get("decoder_type", "mlp"),
            mixed_precision=mp.get("mixed_precision", False),
        )
    if exp_type == "lrvae":
        return LRVAE.for_dataset(
            dataset,
            hidden_channels=hchans,
            beta=beta,
            alpha=alpha,
            z_source=mp.get("z_source", "Ex"),
            pwise_reg=mp.get("pwise_reg", False),
            encoder_type=mp.get("encoder_type", "conv"),
            decoder_type=mp.get("decoder_type", "mlp"),
            residual_connection=mp.get("residual_connection", False),
            mixed_precision=mp.get("mixed_precision", False),
        )
    if exp_type in ("setvae", "setlrvae"):
        kwargs = dict(
            beta=beta,
            latent_channel=mp.get("latent_channel", 128),
            num_points=mp.get("num_points", 2048),
            encoder_hidden=_tup(mp.get("encoder_hidden", (128, 256, 512))),
            decoder_hidden=_tup(mp.get("decoder_hidden", (512, 256, 128))),
            pool_type=mp.get("pool_type", "max"),
            use_attention=mp.get("use_attention", True),
            d_model=mp.get("d_model", 256),
            num_heads=mp.get("num_heads", 4),
            num_encoder_layers=mp.get("num_encoder_layers", 2),
            num_decoder_layers=mp.get("num_decoder_layers", 2),
            ff_dim=mp.get("ff_dim", 512),
            attn_dropout=mp.get("attn_dropout", 0.0),
            mixed_precision=mp.get("mixed_precision", False),
            use_flash=mp.get("use_flash", False),
            moe_experts=mp.get("moe_experts", 0),
            moe_capacity_factor=mp.get("moe_capacity_factor", 1.25),
            remat=mp.get("remat", False),
        )
        if exp_type == "setlrvae":
            return SetLRVAE(alpha=alpha, **kwargs)
        return SetVAE(**kwargs)
    raise ValueError(f"Unsupported experiment type: {exp_type}")
