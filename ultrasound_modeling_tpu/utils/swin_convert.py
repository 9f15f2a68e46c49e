"""TF-checkpoint -> npz converter for pretrained Swin weights.

The reference downloads ImageNet-pretrained TF Swin checkpoints (the
rishigami/Swin-Transformer-TF release) and loads them with
``net.load_weights`` (reference: SwinTransformer.py:461-486).  This module is
the TPU-native equivalent: it reads such a TF-format checkpoint (object-path
keys, ``model.save_weights`` layout), renames every variable onto this
framework's Flax ``SwinBackbone`` parameter tree, and emits the portable
'/'-joined npz that ``utils.checkpoint.load_params_npz`` merges
(shape-checked).

Name mapping (TF object path -> Flax param path):

  patch_embed/proj/{kernel,bias}             -> proj/{kernel,bias}
  patch_embed/norm/{gamma,beta}              -> patch_norm/{scale,bias}
  basic_layers/I/blocks/D/norm1/{gamma,beta} -> layerI_blockD/norm1/{scale,bias}
  basic_layers/I/blocks/D/attn/qkv/kernel    -> layerI_blockD/attn/qkv_kernel
  basic_layers/I/blocks/D/attn/qkv/bias      -> layerI_blockD/attn/qkv_bias
  basic_layers/I/blocks/D/attn/proj/kernel   -> layerI_blockD/attn/proj_kernel
  basic_layers/I/blocks/D/attn/proj/bias     -> layerI_blockD/attn/proj_bias
  basic_layers/I/blocks/D/attn/
      relative_position_bias_table           -> layerI_blockD/attn/
                                                relative_position_bias_table
  basic_layers/I/blocks/D/mlp/fcN/{kernel,bias}
                                             -> layerI_blockD/mlp_fcN/{...}
  basic_layers/I/downsample/reduction/kernel -> layerI_downsample/reduction/kernel
  basic_layers/I/downsample/norm/{gamma,beta}-> layerI_downsample/norm/{scale,bias}
  norm/{gamma,beta}                          -> norm/{scale,bias}

Dense kernels are [in, out] in both frameworks and conv kernels are HWIO in
both, so no transposes are needed; only LayerNorm gamma/beta rename to
scale/bias.  Non-parameters (relative_position_index, attn_mask,
save_counter, optimizer slots) and the classification head (this framework's
Swin is a segmentation backbone) are skipped.
"""

from __future__ import annotations

import os
import re
import tarfile
from typing import Dict, Optional, Tuple

import numpy as np

# Release URL scheme the reference fetches checkpoints from
# (reference: SwinTransformer.py:469-471).
PRETRAINED_URL = ("https://github.com/rishigami/Swin-Transformer-TF/releases"
                  "/download/v0.1-tf-swin-weights/{model_name}.tgz")

# Model zoo table mirrored from the reference release names
# (reference: SwinTransformer.py:8-21 CFGS).
PRETRAINED_CFGS = {
    "swin_tiny_224": dict(embed_dim=96, depths=(2, 2, 6, 2),
                          num_heads=(3, 6, 12, 24), window=(7, 7)),
    "swin_small_224": dict(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), window=(7, 7)),
    "swin_base_224": dict(embed_dim=128, depths=(2, 2, 18, 2),
                          num_heads=(4, 8, 16, 32), window=(7, 7)),
    "swin_base_384": dict(embed_dim=128, depths=(2, 2, 18, 2),
                          num_heads=(4, 8, 16, 32), window=(12, 12)),
    "swin_large_224": dict(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), window=(7, 7)),
    "swin_large_384": dict(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), window=(12, 12)),
}

_ATTR_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"

_SKIP_PATTERNS = (
    "save_counter", "optimizer", "_CHECKPOINTABLE_OBJECT_GRAPH",
    "relative_position_index", "attn_mask", "keras_api", "avgpool",
)

_NORM_RENAME = {"gamma": "scale", "beta": "bias"}

_BLOCK_RE = re.compile(
    r"^basic_layers/(\d+)/blocks/(\d+)/(.+)$")
_DOWNSAMPLE_RE = re.compile(
    r"^basic_layers/(\d+)/downsample/(reduction|norm)/(\w+)$")


def fetch_pretrained(model_name: str, cache_dir: Optional[str] = None,
                     timeout: float = 60.0) -> str:
    """Download + untar a released pretrained checkpoint; return the
    ``.ckpt`` prefix path ``load_pretrained_swin`` consumes.

    Mirrors the reference's ``tf.keras.utils.get_file(..., untar=True)`` +
    ``'{dir}/{model_name}.ckpt'`` resolution (reference:
    SwinTransformer.py:469-478) without importing TF.  Gated on network
    availability: offline boxes get a RuntimeError naming the URL so the
    tarball can be provisioned manually into ``cache_dir``.
    """
    if model_name not in PRETRAINED_CFGS:
        raise KeyError(f"unknown pretrained model {model_name!r}; "
                       f"have {sorted(PRETRAINED_CFGS)}")
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "ultrasound_modeling_tpu",
        "pretrained")
    os.makedirs(cache_dir, exist_ok=True)
    ckpt_prefix = os.path.join(cache_dir, model_name, f"{model_name}.ckpt")
    if os.path.exists(ckpt_prefix + ".index"):
        return ckpt_prefix
    url = PRETRAINED_URL.format(model_name=model_name)
    tgz = os.path.join(cache_dir, f"{model_name}.tgz")
    if not os.path.exists(tgz):
        import urllib.error
        import urllib.request
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp, \
                    open(tgz + ".part", "wb") as f:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(tgz + ".part", tgz)
        except (urllib.error.URLError, OSError) as e:
            if os.path.exists(tgz + ".part"):
                os.remove(tgz + ".part")
            raise RuntimeError(
                f"cannot fetch pretrained Swin checkpoint (offline?): {url} "
                f"({e}); download it elsewhere and place the extracted "
                f"'{model_name}/' directory under {cache_dir}") from e
    with tarfile.open(tgz) as tar:
        tar.extractall(cache_dir, filter="data")
    if not os.path.exists(ckpt_prefix + ".index"):
        raise RuntimeError(
            f"{tgz} extracted but {ckpt_prefix}.index not found — release "
            "layout changed?")
    return ckpt_prefix


def _map_leaf(tail: str) -> Optional[str]:
    """Map a within-block tail like 'attn/qkv/kernel' to the Flax leaf."""
    parts = tail.split("/")
    if parts[0] in ("norm1", "norm2") and len(parts) == 2:
        return f"{parts[0]}/{_NORM_RENAME.get(parts[1], parts[1])}"
    if parts[0] == "attn":
        if parts[1] == "relative_position_bias_table":
            return "attn/relative_position_bias_table"
        if len(parts) == 3 and parts[1] in ("qkv", "proj"):
            return f"attn/{parts[1]}_{parts[2]}"
        return None
    if parts[0] == "mlp" and len(parts) == 3:
        return f"mlp_{parts[1]}/{parts[2]}"
    return None


def map_tf_name(name: str, prefix: str = "") -> Optional[str]:
    """Map one canonical TF object path to a Flax param path (or None to
    skip).  ``prefix`` prepends e.g. 'backbone/' when the backbone sits
    inside a segmenter."""
    for pat in _SKIP_PATTERNS:
        if pat in name:
            return None
    name = name.removesuffix(_ATTR_SUFFIX).removesuffix(":0")
    # Keras-3-era checkpoints track Dense/Conv kernels at the private
    # attribute '_kernel'; the original (TF-2.4 Keras) release uses
    # 'kernel'.  Normalize leading-underscore leaves so both load.
    name = "/".join(seg.lstrip("_") or seg for seg in name.split("/"))
    # top-of-model head is a classifier; the segmentation decoder is ours
    if name.startswith("head/"):
        return None

    out = None
    if name.startswith("patch_embed/proj/"):
        out = "proj/" + name.rsplit("/", 1)[1]
    elif name.startswith("patch_embed/norm/"):
        leaf = name.rsplit("/", 1)[1]
        out = "patch_norm/" + _NORM_RENAME.get(leaf, leaf)
    elif name.startswith("norm/"):
        leaf = name.rsplit("/", 1)[1]
        out = "norm/" + _NORM_RENAME.get(leaf, leaf)
    else:
        m = _BLOCK_RE.match(name)
        if m:
            leaf = _map_leaf(m.group(3))
            if leaf is None:
                return None
            out = f"layer{m.group(1)}_block{m.group(2)}/{leaf}"
        else:
            m = _DOWNSAMPLE_RE.match(name)
            if m:
                leaf = _NORM_RENAME.get(m.group(3), m.group(3))
                out = f"layer{m.group(1)}_downsample/{m.group(2)}/{leaf}"
    if out is None:
        return None
    return prefix + out


def read_tf_checkpoint(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read every tensor from a TF checkpoint (lazy TF import; host-only)."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def convert_tf_checkpoint(ckpt_path: str, out_npz: str,
                          prefix: str = "backbone/"
                          ) -> Tuple[Dict[str, np.ndarray], list]:
    """TF checkpoint -> Flax-named npz.  Returns (converted dict, skipped
    names).  Feed the npz to ``utils.checkpoint.load_params_npz`` for the
    shape-checked merge into a live param tree."""
    raw = read_tf_checkpoint(ckpt_path)
    converted, skipped = {}, []
    for name, arr in raw.items():
        flax_name = map_tf_name(name, prefix=prefix)
        if flax_name is None:
            skipped.append(name)
            continue
        converted[flax_name] = arr
    np.savez(out_npz, **converted)
    return converted, skipped


def load_pretrained_swin(params, ckpt_path: str, prefix: str = "backbone/",
                         strict: bool = False):
    """One-call path: convert + merge into ``params`` (the reference's
    ``pretrained=True`` build flow, SwinTransformer.py:461-486)."""
    import tempfile

    from ultrasound_modeling_tpu.utils.checkpoint import load_params_npz

    with tempfile.NamedTemporaryFile(suffix=".npz") as tmp:
        convert_tf_checkpoint(ckpt_path, tmp.name, prefix=prefix)
        return load_params_npz(params, tmp.name, strict=strict)
