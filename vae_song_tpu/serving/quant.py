"""Post-training int8 quantization for the serving (decode) path.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 rate
(394 vs 197 TOPS peak), so a decode whose FLOPs live in dense layers
(the MLP decoders; the SetVAE decoder's attention projections + FFN)
can serve meaningfully faster from int8 weights. The reference has no
quantization story (its serving mode is test.py's f32 z -> decode loop);
this is a beyond-reference subsystem, opt-in via
`cli/generate.py --quant int8`.

Design (AQT-style, weight-static / activation-dynamic):

  * weights: per-OUTPUT-channel symmetric int8 — each Dense kernel
    column j is stored as w8[:, j] = round(w[:, j] / s_j) with
    s_j = max|w[:, j]| / 127. Quantized once, up front
    (`quantize_dense_params`), so serving never touches the f32 kernel.
  * activations: per-token symmetric int8, computed on the fly —
    s_x = max|x_row| / 127 per trailing-dim row. One cheap VPU pass;
    keeps accuracy through the decoders' LeakyReLU/LayerNorm ranges.
  * matmul: lax.dot_general(x8, w8, preferred_element_type=int32) —
    XLA lowers this to the MXU's int8 path — then one f32 rescale by
    (s_x * s_j) plus the (unquantized, tiny) bias.

Only 2-D `nn.Dense` kernels quantize; convs, BatchNorm/LayerNorm,
PositiveLinear (ICNN — its exp/clamp reparameterization is
positivity-load-bearing) and the attention softmax stay in the float
path. The hook is flax's method interception (`nn.intercept_methods`):
`make_quantized_decode` wraps `model.apply(..., method="decode")` so
every `nn.Dense.__call__` whose module path appears in the quantized
table routes through `int8_dense` instead — no model surgery, works
for every model family, and composes with jit (the interceptor runs at
trace time; the quantized table is a normal pytree argument of the
jitted function).

Accuracy: the set/MLP decoders measure ~1e-2 relative output error at
int8 (tests/test_quant.py exercises exact-representable and random
cases); generation is sampling from a learned density, where that is
visually and metrically negligible — but this is opt-in serving-only,
never a training path.
"""

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn


def _quantize_kernel(w):
    """Per-output-channel symmetric int8 for a [K, F] kernel.

    Returns (w8 int8 [K, F], scale f32 [F]) with
    w ~= w8 * scale (column-wise)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)            # [F]
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_dense_params(params, min_fan_in: int = 16):
    """Build the quantized-dense table from a params pytree.

    Walks the (nested-dict) params tree; every node holding a 2-D
    `kernel` (an nn.Dense) with fan-in >= `min_fan_in` contributes an
    entry keyed by its "/"-joined module path:
    {path: {"w8": int8 [K, F], "scale": f32 [F], "bias": f32 [F]|None}}.

    `min_fan_in` skips tiny layers (e.g. the 2-D toy decoders' final
    [2, F] projections) where int8 rounding noise is large relative to
    the row length and the matmul is free anyway.
    """
    table = {}

    def walk(node, path):
        if not isinstance(node, dict):
            return
        k = node.get("kernel")
        if k is not None and getattr(k, "ndim", 0) == 2 and k.shape[0] >= min_fan_in:
            w8, scale = _quantize_kernel(k)
            b = node.get("bias")
            table["/".join(path)] = {
                "w8": w8,
                "scale": scale,
                "bias": None if b is None else jnp.asarray(b, jnp.float32),
            }
        for name, child in node.items():
            if name not in ("kernel", "bias"):
                walk(child, path + (name,))

    walk(params, ())
    return table


def int8_dense(x, w8, w_scale, bias, out_dtype=None):
    """Dynamic-activation int8 dense: y = dequant(int8(x) @ w8) + bias.

    x: [..., K] float; w8: [K, F] int8; w_scale: [F] f32 per-column.
    Activations quantize per token (per trailing-dim row) so one
    outlier row cannot crush the whole batch's resolution."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        x8, w8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * (s_x * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype or x.dtype)


def _make_interceptor(qtable):
    """nn.intercept_methods hook replacing table-listed nn.Dense calls."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if type(mod) is not nn.Dense or context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        entry = qtable.get("/".join(mod.path))
        if entry is None:
            return next_fun(*args, **kwargs)
        (x,) = args
        # flax result dtype: the module's dtype attr, else the f32
        # params/input promotion nn.Dense itself would produce
        out_dtype = mod.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return int8_dense(x, entry["w8"], entry["scale"], entry["bias"],
                          out_dtype=out_dtype)

    return interceptor


def make_quantized_decode(model, batch_stats):
    """Jitted int8 decode: (qtable, float_params, z) -> samples.

    `float_params` is still passed (and traced) for the layers the
    table does NOT cover (convs, norms, small/non-Dense layers); the
    covered kernels' f32 values are never read by the compiled program,
    so XLA's DCE drops their transfers. The quantized table is a plain
    pytree argument — swap checkpoints without retracing.
    """

    @jax.jit
    def decode(qtable, params, z):
        with nn.intercept_methods(_make_interceptor(qtable)):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                z,
                train=False,
                method="decode",
            )

    return decode


def quantized_coverage(qtable, params):
    """(covered_kernel_elements, total_dense_kernel_elements) — how much
    of the decode's dense weight volume serves from int8."""
    total = 0

    def walk(node):
        nonlocal total
        if not isinstance(node, dict):
            return
        k = node.get("kernel")
        if k is not None and getattr(k, "ndim", 0) == 2:
            total += int(k.size)
        for name, child in node.items():
            if name not in ("kernel", "bias"):
                walk(child)

    walk(params)
    covered = sum(int(e["w8"].size) for e in qtable.values())
    return covered, total
