from vae_song_tpu.ops import losses, warmup, chamfer, metrics, lipschitz  # noqa: F401
