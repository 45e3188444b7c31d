"""Dynamic int8 convolution — the opt-in quantized serving path.

v5e executes int8 x int8 -> int32 matmuls/convs at 2x the bf16 TOPs
(394 vs 197 peak). Measured on a tower-shaped 3x3 conv (tools/int8_probe.py,
readback-clocked): bf16 119.6 TFLOP/s vs int8 200.5 TOP/s — a 1.68x kernel
speedup, which matters because both shipped profiles are FLOP-bound at ~76%
MFU (ROUND3_NOTES perf attribution).

:class:`QuantConv` is a drop-in ``nn.Conv`` substitute with the IDENTICAL
parameter tree ("kernel" ``[Kh,Kw,Cin,Cout]`` fp32 + optional "bias"), so
checkpoints, converters (convert/torch_weights.py) and trainers are
untouched: train in bf16/fp32, then *serve* the same params with
``quant=True`` configs. Quantization is dynamic (no calibration pass):

* weights: symmetric per-output-channel, ``sw[o] = max|w[..,o]| / 127``
  (quantized once per call; XLA hoists it since params are loop-invariant);
* activations: symmetric per-sample, ``sx[b] = max|x[b]| / 127`` — each
  sample's conv is independent, so per-sample scales dequantize exactly and
  one outlier frame cannot crush the whole batch's resolution;
* accumulation in int32 (``preferred_element_type``), dequantized by
  ``sx[b] * sw[o]`` in the conv epilogue (XLA fuses it).

Static calibration (``quant="static"``): the per-sample amax costs an extra
full read of every conv input plus a reduction barrier before the int8 conv
can start. The static path replaces it with a per-layer calibrated constant
held in the ``quant_stats`` flax collection: one calibration forward with
``mutable=["quant_stats"]`` records each layer's running activation amax
(:func:`HandNetPipeline.calibrate <handnet_tpu.models.pipeline>` wires the
two-stage order — detector on frames first, then A2J on the crops the
calibrated detector produces), after which serving quantizes with the stored
scalar — a pure elementwise op XLA fuses into the producer's epilogue.
Out-of-calibration-range activations saturate at +-127 (symmetric clip).

This file has no reference counterpart — the reference serves fp32/AMP
(CUDA); int8 serving is a TPU-first addition priced by the synthetic study
(tools/resolution_study.py ``@q`` spec) like the fast/turbo points.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PaddingLike = Union[str, int, Sequence[Tuple[int, int]]]


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def _norm_padding(padding: PaddingLike, kernel_size: Tuple[int, int],
                  kernel_dilation: Tuple[int, int],
                  strides: Tuple[int, int],
                  in_hw: Tuple[int, int]) -> Sequence[Tuple[int, int]]:
    if isinstance(padding, str):
        if padding.upper() == "SAME":
            # XLA SAME semantics (out = ceil(in/stride)), which depend on
            # the input size when stride > 1 — a fixed (eff-1) pad would
            # shift strided convs one pixel vs the nn.Conv being replaced
            pads = []
            for n, k, d, s in zip(in_hw, kernel_size, kernel_dilation,
                                  strides):
                eff = (k - 1) * d + 1
                out = -(-n // s)
                total = max((out - 1) * s + eff - n, 0)
                lo = total // 2
                pads.append((lo, total - lo))
            return pads
        if padding.upper() == "VALID":
            return [(0, 0), (0, 0)]
        raise ValueError(f"unsupported padding {padding!r}")
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    return [tuple(p) for p in padding]


def quantize_symmetric(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization: returns (q, scale) with x ~= q * scale.

    ``axes`` are the axes reduced away when computing the amax; the returned
    scale keeps those axes as size-1 for broadcasting.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


class QuantConv(nn.Module):
    """``nn.Conv``-compatible dynamic-int8 convolution (inference path).

    Same constructor surface as the subset of ``nn.Conv`` used in this
    package and the same parameter shapes/names; see module docstring.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: PaddingLike = "SAME"
    kernel_dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    # use a calibrated per-layer activation scale (``quant_stats`` collection)
    # instead of the on-the-fly per-sample amax — see module docstring
    static_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ksize = _pair(self.kernel_size)
        dilation = _pair(self.kernel_dilation)
        kernel = self.param("kernel", self.kernel_init,
                            (*ksize, x.shape[-1], self.features), jnp.float32)
        wq, sw = quantize_symmetric(kernel, axes=(0, 1, 2))  # sw [1,1,1,Cout]
        if self.static_scale:
            amax_var = self.variable("quant_stats", "act_amax",
                                     lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("quant_stats"):
                # calibration pass: fold this batch's global amax into the
                # running max; the forward itself stays dynamic so the
                # calibration outputs are the dynamic path's outputs
                batch_amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                amax_var.value = jnp.maximum(amax_var.value, batch_amax)
                xq, sx = quantize_symmetric(x, axes=(1, 2, 3))
            else:
                sx = jnp.maximum(amax_var.value, 1e-8) / 127.0  # scalar
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
        else:
            xq, sx = quantize_symmetric(x, axes=(1, 2, 3))   # sx [B,1,1,1]
        acc = jax.lax.conv_general_dilated(
            xq, wq, window_strides=_pair(self.strides),
            padding=_norm_padding(self.padding, ksize, dilation,
                                  _pair(self.strides), x.shape[1:3]),
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            out = out + bias
        return out.astype(self.dtype)


def conv_layer(quant: Union[bool, str], *args, **kwargs):
    """``nn.Conv`` or :class:`QuantConv` with the same arguments.

    ``quant``: ``False`` -> float ``nn.Conv``; ``True`` / ``"dynamic"`` ->
    per-sample dynamic int8; ``"static"`` -> calibrated static-scale int8
    (requires a ``quant_stats`` collection — see module docstring).
    """
    if quant == "static":
        return QuantConv(*args, static_scale=True, **kwargs)
    if quant:
        return QuantConv(*args, **kwargs)
    return nn.Conv(*args, **kwargs)


def _walk_quant_stats(variables):
    """Yield (path, leaf) for every leaf under any ``quant_stats`` node."""

    def flatten(prefix: str, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from flatten(f"{prefix}/{k}", v)
        else:
            yield prefix, tree

    def find(prefix: str, tree):
        if not isinstance(tree, dict):
            return
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if k == "quant_stats":
                yield from flatten(p, v)
            else:
                yield from find(p, v)

    yield from find("", variables)


def assert_calibrated(variables) -> None:
    """Raise if any static-int8 ``act_amax`` is still zero.

    An uncalibrated ``quant="static"`` model does not fail — ``sx`` becomes
    ~1e-8/127, every activation saturates to ±127, and the outputs are
    finite garbage. Serving entry points call this after variables are
    final so the failure is loud instead. No-op for float/dynamic configs
    (no ``quant_stats`` in the tree).
    """
    bad = [p for p, leaf in _walk_quant_stats(variables)
           if float(np.asarray(leaf)) == 0.0]
    if bad:
        raise ValueError(
            f"{len(bad)} static-int8 activation scale(s) are zero — the "
            f"model was never calibrated (HandNetPipeline.calibrate / "
            f"load_calibration), or calibration saw all-zero inputs. "
            f"First: {bad[:3]}")


def apply_margin(variables, margin: float):
    """Scale every calibrated activation amax by ``1 + margin``.

    The static path clips activations outside the calibrated range at ±127
    (module docstring); calibration data never covers the true serving
    distribution's tail, so serving slightly-out-of-range frames (brighter
    scenes, closer hands) saturates. A headroom margin trades a little
    in-range resolution (the int8 step grows by ``1+margin``) for immunity
    to moderate distribution shift. The operating curve is measured by
    tools/int8_saturation_study.py: margin=0.25 holds the e2e MPJPE at the
    fp level out to ~2x calibration contrast while pricing in-distribution
    accuracy at noise level; see PipelineConfig.quant_margin for the shipped
    default.

    Returns a new tree (input not mutated); no-op when the tree holds no
    ``quant_stats``. ``margin`` may be negative for study purposes but must
    be > -1.
    """
    if margin <= -1.0:
        raise ValueError(f"quant margin must be > -1, got {margin}")

    def walk(tree, in_stats: bool):
        if isinstance(tree, dict):
            return {k: walk(v, in_stats or k == "quant_stats")
                    for k, v in tree.items()}
        if in_stats:
            return tree * jnp.asarray(1.0 + margin, jnp.float32)
        return tree

    return walk(variables, False)


def npz_path(path: str) -> str:
    """The actual on-disk path for a calibration artifact: ``np.savez``
    appends ``.npz`` to extension-less paths, so both save and load
    normalize through this (a bare ``--calib cal`` still round-trips)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_calibration(path: str, variables) -> int:
    """Persist every ``quant_stats`` collection found in a (possibly nested)
    variables tree as a flat ``.npz``, keyed by tree path.

    Lets a one-pass calibration (:meth:`HandNetPipeline.calibrate`) survive
    process restarts — serve a calibrated static-int8 model without
    re-running calibration data through it. Returns the number of scalars
    saved; raises if the tree holds no ``quant_stats`` (a float/dynamic
    config — nothing to persist).
    """
    flat = {p: np.asarray(leaf) for p, leaf in _walk_quant_stats(variables)}
    if not flat:
        raise ValueError("variables contain no quant_stats collections "
                         "(is the config quant='static'?)")
    np.savez(npz_path(path), **flat)
    return len(flat)


def load_calibration(path: str, variables):
    """Merge a :func:`save_calibration` artifact back into ``variables``.

    Returns a new tree (input not mutated). Every key in the file must
    already exist in ``variables``' structure — a calibration saved for a
    different architecture/config fails loudly instead of silently serving
    part-uncalibrated.
    """
    data = np.load(npz_path(path))

    def clone(tree):
        if isinstance(tree, dict):
            return {k: clone(v) for k, v in tree.items()}
        return tree

    out = clone(variables)
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            if not isinstance(node, dict) or p not in node:
                raise KeyError(
                    f"calibration entry {key!r} does not match the variables "
                    f"structure (missing {p!r}) — wrong config/architecture?")
            node = node[p]
        if not isinstance(node, dict) or parts[-1] not in node:
            raise KeyError(
                f"calibration entry {key!r} does not match the variables "
                f"structure — wrong config/architecture?")
        node[parts[-1]] = jnp.asarray(data[key])
    return out
