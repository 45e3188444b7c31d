"""AOT serving artifacts — the TPU-native deployment unit.

The reference deploys as .pth checkpoints plus the model-building python
(scripts/download_models.sh:3-8; handnet_pipeline/handnet_pipeline.py:14-36
rebuilds FCOS+A2J in code and loads state dicts at process start). The
TPU-native equivalent is ahead-of-time export: the FULL fused pipeline graph
(resize -> detect -> NMS -> crop -> pose [-> mesh]) is traced ONCE per
serving batch-bucket, lowered to StableHLO with ``jax.export``, and written
to disk next to the weights and a config manifest. A serving host then
loads and runs the artifact **without the model code, the flax modules, or
a trace step** — cold start is deserialize + XLA compile, immune to model-
code drift, and the same artifact runs on any platform it was exported for
(default: tpu + cpu).

Artifact layout::

    <dir>/manifest.json        config snapshot + shapes + wire format
    <dir>/weights.npz          flattened variables (params, batch stats,
                               and int8 calibration scales when present)
    <dir>/graphs/b<N>.stablehlo   serialized Exported, one per batch bucket

Weights ride as call *arguments* (not baked constants), so one graph file
serves any number of weight refreshes: re-converting a newly trained
checkpoint only rewrites weights.npz.

Portability notes: export forces the einsum A2J decode (the Mosaic pallas
kernel cannot lower for non-TPU export platforms; in-pipeline the two are
measured noise-level apart — ROUND3_NOTES). The GN fast-variance serving
flag is pure XLA and exports to every platform.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import HandNetConfig, load_config

MANIFEST_NAME = "manifest.json"
WEIGHTS_NAME = "weights.npz"
GRAPH_DIR = "graphs"
FORMAT_VERSION = 1

# npz round-trips only dtypes numpy itself owns; anything else (bfloat16)
# is stored as float32 and cast back on load via the manifest's dtype map.
_NPZ_SAFE = {"float32", "float64", "float16", "int8", "int16", "int32",
             "int64", "uint8", "uint16", "uint32", "uint64", "bool"}


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict pytree -> flat {'a/b/c': ndarray} (insertion-ordered)."""
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for key, val in tree.items():
            if "/" in str(key):
                raise ValueError(f"key {key!r} contains the path separator")
            flat.update(flatten_tree(val, f"{prefix}{key}/"))
        return flat
    flat[prefix[:-1]] = np.asarray(tree)
    return flat


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`flatten_tree`."""
    tree: Dict[str, Any] = {}
    for path, val in flat.items():
        node = tree
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return tree


def _save_weights(path: str, variables) -> Dict[str, str]:
    """Write the flattened variables; return {path: original_dtype} for
    leaves that had to be widened for npz."""
    flat = flatten_tree(variables)
    dtype_map: Dict[str, str] = {}
    out: Dict[str, np.ndarray] = {}
    for key, val in flat.items():
        if val.dtype.name not in _NPZ_SAFE:
            dtype_map[key] = val.dtype.name
            val = val.astype(np.float32)
        out[key] = val
    # uncompressed: float weights are ~incompressible and zlib costs minutes
    # at real checkpoint sizes; artifact size is dominated by them either way
    np.savez(path, **out)
    return dtype_map


def _load_weights(path: str, dtype_map: Dict[str, str]):
    with np.load(path) as data:
        flat = {key: jnp.asarray(data[key], dtype=dtype_map.get(key))
                for key in data.files}
    return unflatten_tree(flat)


def export_pipeline(cfg: HandNetConfig, variables, out_dir: str,
                    buckets: Sequence[int] = (1, 8, 32, 128),
                    frame_hw: Tuple[int, int] = (480, 640),
                    dtype: Any = jnp.bfloat16,
                    with_xyz: bool = False,
                    quantized_wire: bool = False,
                    out_fields: Optional[Iterable[str]] = None,
                    platforms: Sequence[str] = ("tpu", "cpu")) -> str:
    """Export the fused pipeline to an AOT serving artifact directory.

    Args:
      cfg: pipeline config (geometry/architecture baked into the graphs).
      variables: pipeline variables — for static-int8 configs they must
        already be calibrated (``HandNetPipeline.calibrate``).
      buckets: batch sizes to pre-lower, mirroring PipelineServer's
        batch-bucket ladder; the loader routes each request to the smallest
        bucket that fits.
      frame_hw: input frame geometry.
      dtype: compute dtype the modules are built with (params stay fp32).
      with_xyz: also take ``paras [B,4]`` intrinsics and emit camera-frame
        joints (the graphs then have a 4th argument).
      quantized_wire: graphs take sensor-native uint8 RGB / uint16 mm depth
        and dequantize on device (PipelineServer's 4x-less-PCIe wire format).
      out_fields: restrict the output dict (e.g. drop the [B,176,176,C]
        crops from the device->host transfer); None keeps everything.
      platforms: lowering targets; the artifact runs on any of them.

    Returns ``out_dir``.
    """
    from jax import export as jax_export

    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn import quant as quantlib

    buckets = tuple(sorted(set(int(b) for b in buckets)))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")

    pipe = HandNetPipeline(cfg, dtype=dtype)
    pipe.a2j.decode_pallas = False  # portable decode (see module docstring)
    if pipe.needs_calibration():
        quantlib.assert_calibrated(variables)

    height, width = frame_hw
    im_dt = jnp.uint8 if quantized_wire else jnp.float32
    d_dt = jnp.uint16 if quantized_wire else jnp.float32

    fields = tuple(out_fields) if out_fields is not None else None

    def fwd(v, im, d, *maybe_paras):
        if quantized_wire:
            im = im.astype(jnp.float32) / 255.0
            d = d.astype(jnp.float32) / 1000.0
        out = pipe(v, im, d, *maybe_paras)
        if fields is not None:
            out = {k: o for k, o in out.items() if k in fields}
        return out

    os.makedirs(os.path.join(out_dir, GRAPH_DIR), exist_ok=True)
    var_struct = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)
    for bucket in buckets:
        args = [var_struct,
                jax.ShapeDtypeStruct((bucket, height, width, 3), im_dt),
                jax.ShapeDtypeStruct((bucket, height, width), d_dt)]
        if with_xyz:
            args.append(jax.ShapeDtypeStruct((bucket, 4), jnp.float32))
        exported = jax_export.export(jax.jit(fwd),
                                     platforms=tuple(platforms))(*args)
        graph_path = os.path.join(out_dir, GRAPH_DIR, f"b{bucket}.stablehlo")
        with open(graph_path, "wb") as f:
            f.write(exported.serialize())

    dtype_map = _save_weights(os.path.join(out_dir, WEIGHTS_NAME), variables)
    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "config": dataclasses.asdict(cfg),
        "frame_hw": [height, width],
        "buckets": list(buckets),
        "compute_dtype": np.dtype(dtype).name,
        "with_xyz": bool(with_xyz),
        "quantized_wire": bool(quantized_wire),
        "out_fields": list(fields) if fields is not None else None,
        "weights_dtypes": dtype_map,
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ServingArtifact:
    """Load and run an exported pipeline artifact — no model code needed.

    ``predict`` accepts any batch size: requests larger than the top bucket
    are chunked through it; each chunk (and the remainder) routes to the
    smallest pre-lowered bucket that fits, padded rows sliced back off —
    the same routing PipelineServer uses live.
    """

    def __init__(self, manifest: Dict[str, Any], variables,
                 graphs: Dict[int, Any]):
        self.manifest = manifest
        self.variables = variables
        self._graphs = graphs  # bucket -> jitted call
        self.buckets = tuple(sorted(graphs))
        self.frame_hw = tuple(manifest["frame_hw"])
        self.with_xyz = manifest["with_xyz"]
        self.quantized_wire = manifest["quantized_wire"]

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        from jax import export as jax_export

        with open(os.path.join(path, MANIFEST_NAME)) as f:
            manifest = json.load(f)
        if manifest["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest['format_version']} != "
                f"supported {FORMAT_VERSION}")
        variables = _load_weights(os.path.join(path, WEIGHTS_NAME),
                                  manifest.get("weights_dtypes", {}))
        graphs: Dict[int, Any] = {}
        graph_dir = os.path.join(path, GRAPH_DIR)
        for bucket in manifest["buckets"]:
            with open(os.path.join(graph_dir, f"b{bucket}.stablehlo"),
                      "rb") as f:
                exported = jax_export.deserialize(f.read())
            # jit the deserialized call so repeat invocations hit the
            # executable cache instead of re-staging the StableHLO
            graphs[int(bucket)] = jax.jit(exported.call)
        return cls(manifest, variables, graphs)

    def config(self) -> HandNetConfig:
        """Reconstruct the HandNetConfig the artifact was exported with."""
        return load_config(self.manifest["config"])

    def _bucket_for(self, n: int) -> int:
        for bucket in self.buckets:
            if bucket >= n:
                return bucket
        return self.buckets[-1]

    def _run_chunk(self, rgb: np.ndarray, depth: np.ndarray,
                   paras: Optional[np.ndarray]) -> Dict[str, jnp.ndarray]:
        n = rgb.shape[0]
        bucket = self._bucket_for(n)
        pad = bucket - n
        if pad:
            # explicit shapes: zeros_like(rgb[:pad]) silently under-pads
            # when pad > n (caught by the first real-TPU artifact run,
            # bucket 8 / n 3 — the CPU smoke's bucket 2 couldn't hit it)
            rgb = np.concatenate(
                [rgb, np.zeros((pad, *rgb.shape[1:]), rgb.dtype)], axis=0)
            depth = np.concatenate(
                [depth, np.zeros((pad, *depth.shape[1:]), depth.dtype)],
                axis=0)
            if paras is not None:
                paras = np.concatenate(
                    [paras, np.ones((pad, *paras.shape[1:]), paras.dtype)],
                    axis=0)
        args = [self.variables, rgb, depth]
        if self.with_xyz:
            if paras is None:
                raise ValueError("artifact exported with_xyz=True: predict "
                                 "requires paras [B,4]")
            args.append(paras)
        out = self._graphs[bucket](*args)
        if pad:
            out = {k: v[:n] for k, v in out.items()}
        return out

    def predict(self, rgb: np.ndarray, depth: np.ndarray,
                paras: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """Frames in, pipeline outputs out (see HandNetPipeline.__call__)."""
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        if paras is not None:
            paras = np.asarray(paras, np.float32)
        if rgb.ndim != 4 or rgb.shape[1:3] != self.frame_hw:
            raise ValueError(
                f"rgb must be [B, {self.frame_hw[0]}, {self.frame_hw[1]}, 3]"
                f", got {rgb.shape}")
        want_im = np.uint8 if self.quantized_wire else np.float32
        want_d = np.uint16 if self.quantized_wire else np.float32
        rgb = rgb.astype(want_im, copy=False)
        depth = depth.astype(want_d, copy=False)

        top = self.buckets[-1]
        chunks = []
        for start in range(0, rgb.shape[0], top):
            sl = slice(start, start + top)
            chunks.append(self._run_chunk(
                rgb[sl], depth[sl],
                paras[sl] if paras is not None else None))
        if len(chunks) == 1:
            return {k: np.asarray(v) for k, v in chunks[0].items()}
        return {k: np.concatenate([np.asarray(c[k]) for c in chunks], axis=0)
                for k in chunks[0]}
