"""FingerPrinter encoder (Flax) — TPU-native re-design of the reference CNN.

Architecture contract (reference ``model/fp/nnfp.py``):

    IN (B,F,T,1) >> [ConvLayer]x8 >> Flatten >> DivEnc >> L2-normalize >> (B,128)

- ConvLayer = Conv1x3 -> ELU -> Norm -> Conv3x1 -> ELU -> Norm with the
  stride schedule of ``nnfp.py:193-197`` (time halves on the 1x3 conv,
  freq on the 3x1 conv) and 'SAME' padding, channels
  [128,128,256,256,512,512,1024,1024].
- ``layer_norm2d`` (default, ``config/default.yaml:48``) normalizes each
  sample over the whole (F,T,C) volume with per-position scale/offset —
  parameter shapes follow TF's LayerNormalization(axis=(1,2,3)), which is
  what makes the 2-s model 19,224,576 params (``nnfp.py:270-274``; the
  1-s model is 16,939,008).
- DivEnc (``nnfp.py:86-156``): q=128 slices of the 1024-d flattened
  feature, each through Dense(32, elu) -> Dense(1). The reference loops
  over 128 tiny Dense layers in Python (``nnfp.py:148-151``); here it is
  two batched einsums — one fused MXU matmul pair instead of 256 kernel
  launches.
- BatchNorm is supported for parity but layer-norm is the default; the
  reference itself warns BN misbehaves on TPUs (``nnfp.py:178``).

Mixed precision: convolutions/einsums run in ``dtype`` (bfloat16 by
default on TPU), normalization statistics and the final L2-normalize in
float32, parameters always float32.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (time-stride for the 1x3 conv, freq-stride for the 3x1 conv) per layer,
# expressed exactly like the reference front_strides (nnfp.py:194-197):
# [(freq, time) for conv1x3, (freq, time) for conv3x1].
DEFAULT_STRIDES: Tuple[Tuple[Tuple[int, int], Tuple[int, int]], ...] = (
    ((1, 2), (2, 1)), ((1, 2), (2, 1)),
    ((1, 2), (2, 1)), ((1, 2), (2, 1)),
    ((1, 1), (2, 1)), ((1, 2), (2, 1)),
    ((1, 1), (2, 1)), ((1, 2), (2, 1)),
)
DEFAULT_CHANNELS: Tuple[int, ...] = (128, 128, 256, 256, 512, 512, 1024, 1024)

_glorot = nn.initializers.glorot_uniform()

# Fixed int8 activation scale for ACT_STORE='int8'. LN outputs are
# ~ gamma*N(0,1)+beta, so +-127/16 = +-7.9 covers the range with 1/16
# quantization steps; the scale is a power of two so the bf16
# dequantize multiply is exact.
_INT8_ACT_SCALE = 16.0


def _compress_act(x: jax.Array, mode: Optional[str]) -> jax.Array:
    """Shrink an activation tensor for HBM storage between conv blocks.

    The encoder is HBM-bound (see LayerNorm2d PERF NOTE): at bf16 the
    inter-layer tensors account for ~14 GB of traffic per bsz-1024 step.
    Storing them at 1 byte/elem halves that bound IF the converts fuse
    into the adjacent convolutions. 'int8' uses a fixed power-of-two
    scale (no calibration pass — LN pins the range); 'fp8' stores
    float8_e4m3fn. Inference-only: round() has zero gradient.

    MEASURED NEGATIVE (v5e, bsz 1024, extras/bench_quant.py): bf16
    59,523 segs/s (17.2 ms) vs int8 48,914 (20.9 ms) vs fp8 49,711
    (20.6 ms) — the quantized paths are 16-18% SLOWER. XLA materializes
    the converts as separate HBM passes instead of fusing them into the
    conv operand read, so the "compression" adds traffic. Accuracy
    passes (cos vs bf16: int8 mean .9946/min .9907, fp8 .9887/.9799)
    but the speed gate fails; the path stays opt-in for storage-bound
    uses only (generate to a pre-quantized store). Third traffic
    optimization to lose to XLA's schedule — see the PERF NOTE.
    """
    if mode == "int8":
        return jnp.clip(jnp.round(x.astype(jnp.float32) * _INT8_ACT_SCALE),
                        -127.0, 127.0).astype(jnp.int8)
    if mode == "fp8":
        return x.astype(jnp.float8_e4m3fn)
    return x


def _decompress_act(x: jax.Array, mode: Optional[str], dtype) -> jax.Array:
    """Inverse of _compress_act. Dtype-guarded: uncompressed inputs (the
    first layer's melspec, or a float tap) pass through untouched."""
    if mode == "int8" and x.dtype == jnp.int8:
        return (x.astype(dtype) * dtype(1.0 / _INT8_ACT_SCALE))
    if mode == "fp8" and x.dtype == jnp.float8_e4m3fn:
        return x.astype(dtype)
    return x


def _mxu_einsum(eq: str, a: jax.Array, b: jax.Array) -> jax.Array:
    """bf16 x bf16 -> f32 einsum on TPU (native MXU mode); plain f32 on CPU,
    whose XLA DotThunk lacks mixed-type accumulation."""
    if jax.default_backend() == "tpu":
        return jnp.einsum(eq, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(eq, a.astype(jnp.float32), b.astype(jnp.float32))


class LayerNorm2d(nn.Module):
    """TF-style LayerNormalization(axis=(1,2,3)): per-sample statistics over
    the full (F,T,C) volume, per-position learnable scale/offset.

    PERF NOTE (measured, v5e, bsz 1024): the encoder step is HBM-bound on
    these LN tensors (~14 GB of bf16 activation traffic per step ≈ 17 ms
    at the chip's 819 GB/s — we measure 16.7 ms, >95% of speed-of-light).
    Two attempted optimizations both LOST to XLA's schedule and were
    reverted: a fused one-pass E[x^2]-mean^2 variance (19.3 ms — breaks
    XLA's producer fusion) and a single-pass per-sample Pallas elu+LN
    kernel (28 ms — VPU/reduction-bound at one sample per grid step).
    Keep the formulation below unless a measurement says otherwise.
    """
    epsilon: float = 1e-3  # TF LayerNormalization default

    @nn.compact
    def __call__(self, x: jax.Array,
                 apply_elu: bool = False) -> jax.Array:
        shape = x.shape[1:]
        gamma = self.param("gamma", nn.initializers.ones, shape, jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, shape, jnp.float32)
        if apply_elu:
            x = nn.elu(x)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * gamma + beta).astype(x.dtype)


class ConvLayer(nn.Module):
    """Separable-style conv block (reference ``nnfp.py:20-83``)."""
    hidden_ch: int
    strides: Tuple[Tuple[int, int], Tuple[int, int]]
    norm: str = "layer_norm2d"
    dtype: Any = jnp.float32
    bn_axis: Any = None  # mesh axis name for cross-replica BN stats
    act_store: Optional[str] = None  # None | 'int8' | 'fp8' (inference only)

    def _act_norm(self, x, train: bool):
        """ELU then norm; for layer_norm2d the pair lives in one module so
        XLA fuses the activation into the normalization's reduction pass."""
        if self.norm == "layer_norm2d":
            return LayerNorm2d()(x, apply_elu=True)
        x = nn.elu(x)
        if self.norm == "layer_norm1d":
            return nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32)(x).astype(x.dtype)
        # batch_norm (axis=-1, TF defaults momentum .99 / eps 1e-3). When a
        # mesh axis name is given, batch statistics are pmean'd across it so
        # every replica normalizes by the global-batch moments — the sync the
        # reference never implemented (its nnfp.py:178 warns BN "may cause
        # some problems" on TPUs precisely because stats were per-replica).
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=jnp.float32,
                            axis_name=self.bn_axis)(x).astype(x.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Quantization applies only at inference: round() has zero
        # gradient, and the training step never benefits (its traffic is
        # dominated by saved residuals either way).
        qmode = None if train else self.act_store
        x = _decompress_act(x, qmode, self.dtype)
        x = nn.Conv(self.hidden_ch, (1, 3), strides=self.strides[0],
                    padding="SAME", kernel_init=_glorot,
                    dtype=self.dtype, name="conv_1x3")(x)
        x = _compress_act(self._act_norm(x, train), qmode)
        x = _decompress_act(x, qmode, self.dtype)
        x = nn.Conv(self.hidden_ch, (3, 1), strides=self.strides[1],
                    padding="SAME", kernel_init=_glorot,
                    dtype=self.dtype, name="conv_3x1")(x)
        return _compress_act(self._act_norm(x, train), qmode)


class DivEncLayer(nn.Module):
    """Divide-and-encode head as two batched einsums.

    Equivalent math to the reference's 128-way Python loop of
    Dense(32, elu) -> Dense(1) per slice (``nnfp.py:132-151``), expressed
    as (B,Q,S)x(Q,S,U) and (B,Q,U)x(Q,U,1) contractions that XLA maps to
    single MXU calls.
    """
    q: int = 128
    unit_dim: Tuple[int, int] = (32, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # x: (B, D)
        b, d = x.shape
        assert d % self.q == 0, f"flattened dim {d} not divisible by q={self.q}"
        s = d // self.q
        u0, u1 = self.unit_dim
        # Per-slice glorot: fan axes are the last two, slice axis is batch.
        slice_glorot = nn.initializers.glorot_uniform(in_axis=-2, out_axis=-1,
                                                      batch_axis=0)
        w1 = self.param("w1", slice_glorot, (self.q, s, u0), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (self.q, u0), jnp.float32)
        w2 = self.param("w2", slice_glorot, (self.q, u0, u1), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (self.q, u1), jnp.float32)

        xs = x.reshape(b, self.q, s).astype(self.dtype)
        h = _mxu_einsum("bqs,qsu->bqu", xs, w1.astype(self.dtype)) + b1
        h = nn.elu(h).astype(self.dtype)
        out = _mxu_einsum("bqu,quv->bqv", h, w2.astype(self.dtype)) + b2
        return out[..., 0]  # (B, Q)


class FingerPrinter(nn.Module):
    """The fingerprint encoder g(f(.)) (reference ``nnfp.py:159-231``)."""
    emb_sz: int = 128
    front_hidden_ch: Sequence[int] = DEFAULT_CHANNELS
    front_strides: Sequence = DEFAULT_STRIDES
    fc_unit_dim: Tuple[int, int] = (32, 1)
    norm: str = "layer_norm2d"
    use_l2layer: bool = True
    dtype: Any = jnp.float32
    bn_axis: Any = None
    act_store: Optional[str] = None  # None | 'int8' | 'fp8' (inference only)

    def setup(self):
        ch = list(self.front_hidden_ch)
        if ch[-1] % self.emb_sz != 0:  # round up (nnfp.py:211-212)
            ch[-1] = (ch[-1] // self.emb_sz + 1) * self.emb_sz
        self.conv_layers = [
            ConvLayer(hidden_ch=ch[i], strides=self.front_strides[i],
                      norm=self.norm, dtype=self.dtype, bn_axis=self.bn_axis,
                      act_store=self.act_store,
                      name=f"conv_layer_{i}")
            for i in range(len(self.front_strides))
        ]
        self.div_enc = DivEncLayer(q=self.emb_sz, unit_dim=self.fc_unit_dim,
                                   dtype=self.dtype)

    def front(self, x: jax.Array, train: bool = False) -> jax.Array:
        """f(.): conv stack + flatten -> (B, D)."""
        x = x.astype(self.dtype)
        for layer in self.conv_layers:
            x = layer(x, train=train)
        x = _decompress_act(x, None if train else self.act_store, self.dtype)
        return x.reshape(x.shape[0], -1)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.front(x, train=train)
        g = self.div_enc(f).astype(jnp.float32)
        if self.use_l2layer:
            g = l2_normalize(g)
        return g

    def taps(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Mini-search validation taps: f, L2(f), L2(g(f))
        (reference trainer.py:67-77)."""
        f = self.front(x, train=False).astype(jnp.float32)
        g = l2_normalize(self.div_enc(f).astype(jnp.float32))
        return f, l2_normalize(f), g


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Match tf.math.l2_normalize semantics (rsqrt(max(sum(x^2), eps)))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def get_fingerprinter(cfg: Dict[str, Any], bn_axis=None) -> FingerPrinter:
    """Build from a framework config dict (reference ``nnfp.py:234-258``).

    Optional ``MODEL.FRONT_HIDDEN_CH`` overrides the conv channel plan
    (defaults to the paper's [128,...,1024]) — useful for small ablations
    and fast CI models. ``bn_axis`` names the mesh axis for cross-replica
    batch-norm statistics (only meaningful with ``MODEL.BN='batch_norm'``
    inside shard_map; pass None on a single-device mesh).
    """
    dtype = jnp.bfloat16 if cfg["MODEL"].get("MIXED_PRECISION", True) else jnp.float32
    ch = tuple(cfg["MODEL"].get("FRONT_HIDDEN_CH", DEFAULT_CHANNELS))
    act_store = cfg["MODEL"].get("ACT_STORE") or None
    if act_store not in (None, "int8", "fp8"):
        raise ValueError(f"MODEL.ACT_STORE must be int8|fp8, got {act_store}")
    return FingerPrinter(emb_sz=int(cfg["MODEL"]["EMB_SZ"]),
                         front_hidden_ch=ch,
                         norm=cfg["MODEL"]["BN"], dtype=dtype,
                         bn_axis=bn_axis, act_store=act_store)
