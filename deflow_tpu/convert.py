"""Torch checkpoint → flax variables converter.

The parity gate (BASELINE.md) loads the published Lightning checkpoint
(``deflow_best.ckpt``, reference README.md:20,86) into the JAX model.  The
checkpoint layout is pinned by the reference's own loader (reference
deflow.py:41-47): ``ckpt["state_dict"]`` with every model key prefixed
``model.``, strict=False.

Key-layout map (torch module tree → flax param tree), transposes follow the
standard conventions:
    Linear  weight [O, I]        → Dense  kernel [I, O]
    Conv2d  weight [O, I, kh, kw] → Conv  kernel [kh, kw, I, O]
    Conv1d(k=1) weight [O, I, 1] → Dense kernel [I, O]
    BatchNorm weight/bias        → scale/bias (params)
    BatchNorm running_mean/var   → mean/var (batch_stats collection)

The torch side names that differ from our flax module names:
    embedder.feature_net.pfn_layers.0.{0,1}  → embedder/feature_net/{linear,norm}
    backbone.decoder_stepK.u1_u2.{0,2}       → .../decoder_stepK/{u1,u2}
    backbone.decoder_stepK.u4_u5.{0,1}       → .../decoder_stepK/{u4,u5}
    head.decoder.{0,2}                       → head/decoder/{fc1,fc2}
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(v: Any) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:  # torch tensor without importing torch at module scope
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


# torch key substring → flax path-segment rewrites, applied in order.
_SEGMENT_REWRITES = [
    ("feature_net.pfn_layers.0.0", "feature_net.linear"),
    ("feature_net.pfn_layers.0.1", "feature_net.norm"),
    ("u1_u2.0", "u1"),
    ("u1_u2.2", "u2"),
    ("u4_u5.0", "u4"),
    ("u4_u5.1", "u5"),
    ("decoder.0", "decoder.fc1"),
    ("decoder.2", "decoder.fc2"),
]

_LEAF_MAP = {
    "weight": "kernel",   # refined to scale for norm layers below
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}

_NORM_MARKERS = ("batchnorm", "feature_net.norm", "norm1", "norm2", "norm3")


def _is_norm_path(path: str) -> bool:
    return any(m in path for m in _NORM_MARKERS)


def _convert_mha(parts, arr, params, num_heads: int = 4) -> bool:
    """Map torch ``nn.MultiheadAttention`` leaves onto flax
    MultiHeadDotProductAttention (the MMHead ablation decoder,
    reference decoder.py:18-19).  Returns True if the key was consumed.

    torch: in_proj_weight [3d, d] (packed q/k/v), in_proj_bias [3d],
           out_proj.weight [d, d], out_proj.bias [d]
    flax:  query/key/value kernel [d, heads, hd], bias [heads, hd];
           out kernel [heads, hd, d], bias [d].
    """
    try:
        k = parts.index("self_attn") if "self_attn" in parts else parts.index(
            "multihead_attn")
    except ValueError:
        return False
    attn_path = parts[: k + 1]
    rest = parts[k + 1:]
    d = None
    if rest == ["in_proj_weight"]:
        d = arr.shape[1]
        hd = d // num_heads
        for name, block in zip(("query", "key", "value"),
                               (arr[:d], arr[d:2 * d], arr[2 * d:])):
            _set(params, attn_path + [name, "kernel"],
                 block.T.reshape(d, num_heads, hd))
        return True
    if rest == ["in_proj_bias"]:
        d = arr.shape[0] // 3
        hd = d // num_heads
        for name, block in zip(("query", "key", "value"),
                               (arr[:d], arr[d:2 * d], arr[2 * d:])):
            _set(params, attn_path + [name, "bias"],
                 block.reshape(num_heads, hd))
        return True
    if rest == ["out_proj", "weight"]:
        d = arr.shape[0]
        hd = d // num_heads
        _set(params, attn_path + ["out", "kernel"],
             arr.T.reshape(num_heads, hd, d))
        return True
    if rest == ["out_proj", "bias"]:
        _set(params, attn_path + ["out", "bias"], arr)
        return True
    return False


_MMHEAD_LAYER_RE = None


def _rewrite_mmhead(key: str) -> str:
    """``pts_off_transformer.layers.N.`` → ``layers_N.`` (MMHead naming)."""
    global _MMHEAD_LAYER_RE
    import re

    if _MMHEAD_LAYER_RE is None:
        _MMHEAD_LAYER_RE = re.compile(r"pts_off_transformer\.layers\.(\d+)\.")
    return _MMHEAD_LAYER_RE.sub(lambda m: f"layers_{m.group(1)}.", key)


def convert_state_dict(
    state_dict: Mapping[str, Any], strip_prefix: str = "model."
) -> Tuple[Dict, Dict]:
    """Convert a torch state_dict into (params, batch_stats) nested dicts.

    Mirrors the reference loader's prefix strip and strict=False tolerance
    (unknown keys are skipped, reference deflow.py:41-47).
    """
    params: Dict = {}
    stats: Dict = {}

    for key, value in state_dict.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        if key.endswith("num_batches_tracked"):
            continue
        key = _rewrite_mmhead(key)
        for old, new in _SEGMENT_REWRITES:
            key = key.replace(old, new)
        if "self_attn" in key or "multihead_attn" in key:
            if _convert_mha(key.split("."), _to_numpy(value).astype(np.float32),
                            params):
                continue

        parts = key.split(".")
        leaf = parts[-1]
        path = ".".join(parts[:-1])
        arr = _to_numpy(value).astype(np.float32)

        if leaf in ("running_mean", "running_var"):
            _set(stats, parts[:-1] + [_LEAF_MAP[leaf]], arr)
            continue
        if leaf == "weight":
            if _is_norm_path(path):
                _set(params, parts[:-1] + ["scale"], arr)
                continue
            if arr.ndim == 4:      # Conv2d
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 3:    # Conv1d k=1 → Dense
                arr = arr[:, :, 0].T
            elif arr.ndim == 2:    # Linear
                arr = arr.T
            _set(params, parts[:-1] + ["kernel"], arr)
            continue
        if leaf == "bias":
            _set(params, parts[:-1] + ["bias"], arr)
            continue
        # strict=False: silently skip anything unrecognized

    return params, stats


def _set(tree: Dict, parts, value) -> None:
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a Lightning ``.ckpt`` and return its raw ``state_dict``.

    Uses torch.load when torch is importable (it is baked into this
    environment); kept in a function so the core converter stays numpy-only.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: _to_numpy(v) for k, v in sd.items()}


def convert_checkpoint(path: str) -> Dict[str, Dict]:
    """``.ckpt`` file → flax ``{'params': ..., 'batch_stats': ...}``."""
    params, stats = convert_state_dict(load_torch_checkpoint(path))
    return {"params": params, "batch_stats": stats}


# flax path → torch path, applied as ONE regex pass (sequential substring
# replacement would re-match inside its own output, e.g. the "u2" in "u1_u2").
_REVERSE_MAP = {
    "feature_net.linear": "feature_net.pfn_layers.0.0",
    "feature_net.norm": "feature_net.pfn_layers.0.1",
    "u1": "u1_u2.0",
    "u2": "u1_u2.2",
    "u4": "u4_u5.0",
    "u5": "u4_u5.1",
    "decoder.fc1": "decoder.0",
    "decoder.fc2": "decoder.2",
}
import re as _re

_REVERSE_RE = _re.compile(
    r"(?<!\w)(" + "|".join(_re.escape(k) for k in sorted(
        _REVERSE_MAP, key=len, reverse=True)) + r")(?!\w)")


_REVERSE_LAYERS_RE = _re.compile(r"(?<!\w)layers_(\d+)")


def _reverse_key(key: str) -> str:
    key = _REVERSE_RE.sub(lambda m: _REVERSE_MAP[m.group(1)], key)
    # MMHead transformer stack: layers_N → pts_off_transformer.layers.N
    return _REVERSE_LAYERS_RE.sub(r"pts_off_transformer.layers.\1", key)


def export_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse converter: flax variables → reference-layout torch state_dict.

    Lets a model trained here be consumed by reference-lineage tooling (the
    loader contract at reference deflow.py:41-47): keys prefixed ``model.``,
    Linear/Conv transposed back, norm scale/bias → weight/bias, batch_stats →
    running_mean/running_var (+ zero num_batches_tracked per BN).
    """
    out: Dict[str, np.ndarray] = {}
    attn: Dict[str, Dict[str, np.ndarray]] = {}  # attn module path → leaves

    def walk(tree, path, collection):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict) or hasattr(v, "items"):
                walk(v, p, collection)
                continue
            arr = np.asarray(v)
            if "self_attn" in p or "multihead_attn" in p:
                # flax MultiHeadDotProductAttention leaves: stash, then pack
                # into torch nn.MultiheadAttention layout after the walk
                i = p.index("self_attn" if "self_attn" in p else "multihead_attn")
                attn.setdefault(".".join(p[: i + 1]), {})[
                    ".".join(p[i + 1:])] = arr
                continue
            parent = ".".join(p[:-1])
            leaf = p[-1]
            if collection == "batch_stats":
                leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
            elif leaf == "scale":
                leaf = "weight"
            elif leaf == "kernel":
                leaf = "weight"
                if arr.ndim == 4:        # Conv: HWIO → OIHW
                    arr = arr.transpose(3, 2, 0, 1)
                elif arr.ndim == 2:
                    # Dense → Linear [O, I]; the GRU gates were Conv1d(k=1)
                    # in the reference, so restore the trailing kernel dim.
                    arr = arr.T
                    if any(seg in parent for seg in ("convz", "convr", "convq")):
                        arr = arr[:, :, None]
            key = f"{parent}.{leaf}" if parent else leaf
            out["model." + _reverse_key(key)] = np.ascontiguousarray(
                arr, dtype=np.float32)

    walk(variables.get("params", {}), [], "params")
    walk(variables.get("batch_stats", {}), [], "batch_stats")
    # inverse of _convert_mha: q/k/v kernels [d, heads, hd] → packed
    # in_proj_weight [3d, d] (rows = output dim), out kernel [heads, hd, d]
    # → out_proj.weight [d, d]
    for mod, leaves in attn.items():
        d = leaves["query.kernel"].shape[0]
        put = lambda leaf, a: out.__setitem__(
            "model." + _reverse_key(f"{mod}.{leaf}"),
            np.ascontiguousarray(a, dtype=np.float32))
        put("in_proj_weight", np.concatenate(
            [leaves[f"{n}.kernel"].reshape(d, d).T
             for n in ("query", "key", "value")], axis=0))
        if "query.bias" in leaves:
            put("in_proj_bias", np.concatenate(
                [leaves[f"{n}.bias"].reshape(d)
                 for n in ("query", "key", "value")]))
        put("out_proj.weight", leaves["out.kernel"].reshape(d, d).T)
        if "out.bias" in leaves:
            put("out_proj.bias", leaves["out.bias"])
    # torch BN modules also carry num_batches_tracked; provide zeros
    for key in [k for k in out if k.endswith("running_mean")]:
        out[key.replace("running_mean", "num_batches_tracked")] = np.zeros(
            (), np.int64)
    return out


def save_torch_checkpoint(variables: Dict, path: str, epoch: int = 0) -> str:
    """Write a Lightning-compatible ``.ckpt`` from flax variables."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          export_state_dict(variables).items()}
    torch.save({"state_dict": sd, "epoch": epoch}, path)
    return path


def merge_into_variables(variables: Dict, converted: Dict) -> Dict:
    """Overlay converted weights onto an ``init``-ed variable tree.

    Validates that every converted leaf exists in the target tree with a
    matching shape — catching silent mis-mappings that strict=False loading
    would hide.
    """
    import jax

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            where = f"{path}/{k}"
            if k not in dst:
                raise KeyError(f"converted key {where} not present in model variables")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, where)
            else:
                want = np.shape(dst[k])
                if tuple(v.shape) != tuple(want):
                    raise ValueError(f"shape mismatch at {where}: ckpt {v.shape} vs model {want}")
                out[k] = jax.numpy.asarray(v)
        return out

    merged = dict(variables)
    for col in ("params", "batch_stats"):
        if converted.get(col):
            merged[col] = overlay(variables[col], converted[col])
    return merged
