"""Checkpoint -> DiT param-tree loading with key rewriting and fp8 dequant.

Capability parity with reference LTX_2_MLX/loader/weight_converter.py
(load_transformer_weights, key rewrites at :277-315, flat->nested at
:449-500) and fp8_loader.py, re-designed for the TPU param layout:

- Key rewrite rules are DATA (regex pairs), not code.
- Per-block weights are STACKED along a leading layer axis to match the
  lax.scan block layout (model.py here), instead of numeric-key lists.
- fp8 E4M3 weights dequantize as w * weight_scale on the host (numpy), then
  cast to the compute dtype.
- Weights land on device via jax.device_put, optionally with a NamedSharding
  per leaf (tensor-parallel weight streaming without host OOM).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.loader.safetensors_io import SafetensorsFile, read_metadata
from ltx2_tpu.ops.common import Params

# Reference key-rewrite rules (weight_converter.py:277-315) as data.
KEY_REWRITE_RULES: List[Tuple[str, str]] = [
    (r"\.to_out\.0\.", ".to_out."),
    (r"\.audio_ff\.net\.0\.proj\.", ".audio_ff.project_in.proj."),
    (r"\.audio_ff\.net\.2\.", ".audio_ff.project_out."),
    (r"\.ff\.net\.0\.proj\.", ".ff.project_in.proj."),
    (r"\.ff\.net\.2\.", ".ff.project_out."),
]

DIFFUSION_PREFIX = "model.diffusion_model."


def convert_checkpoint_key(key: str, include_audio: bool = False) -> Optional[str]:
    """Checkpoint key (after diffusion prefix strip) -> param-tree key path.

    Returns None for keys to skip (audio weights on video-only load, text
    connectors which belong to the text encoder).
    """
    if not include_audio and ("av_ca" in key or "a2v" in key or "audio" in key.lower()):
        return None
    if "video_embeddings_connector" in key or "audio_embeddings_connector" in key:
        return None
    for pattern, repl in KEY_REWRITE_RULES:
        key = re.sub(pattern, repl, key)
    return key


def is_fp8_checkpoint(path: str) -> bool:
    """Checkpoints quantized to fp8 ship per-tensor `.weight_scale` entries
    (fp8_loader.py:35-51)."""
    f = SafetensorsFile(path)
    return any(k.endswith(".weight_scale") for k in f.keys())


def detect_model_version(path: str) -> str:
    """`model_version` from safetensors metadata (generate.py:224-235)."""
    try:
        return read_metadata(path).get("model_version", "")
    except Exception:
        return ""


def is_v2_model(path: str) -> bool:
    return detect_model_version(path).startswith("2.3")


def read_checkpoint_config(path: str) -> dict:
    """JSON `config` blob from metadata — the source of truth for V2.0/V2.3
    architecture variants (generate.py:142-152)."""
    import json

    try:
        return json.loads(read_metadata(path).get("config", "{}"))
    except Exception:
        return {}


def _dequantize(
    f: SafetensorsFile, key: str, arr: np.ndarray, fp8_scales: Dict[str, str]
) -> np.ndarray:
    if key in fp8_scales:
        from ltx2_tpu.loader.native import fp8_e4m3_dequant

        scale_arr = np.asarray(f.get(fp8_scales[key]))
        if scale_arr.size != 1:
            # Per-tensor scales only (reference fp8_loader.py layout). A
            # multi-element scale silently dequantized by element 0 would
            # corrupt every other channel (review r4) — refuse loudly,
            # consistent with the keep_fp8 path's reshape(()).
            raise ValueError(
                f"{key}: weight_scale has {scale_arr.size} elements; only "
                "per-tensor fp8 scales are supported (reference layout)"
            )
        return fp8_e4m3_dequant(arr, float(scale_arr.reshape(())), target="float32")
    return arr


def _convert_arr(
    arr: np.ndarray,
    tree_key: str,
    target_dtype: str,
    fp32_keys: Tuple[str, ...],
) -> np.ndarray:
    """One tensor's dtype policy: fp32 islands for AdaLN/norm tables, the
    compute dtype for matmul weights."""
    import ml_dtypes

    if any(marker in tree_key for marker in fp32_keys):
        if arr.dtype == ml_dtypes.bfloat16:
            from ltx2_tpu.loader.native import bf16_to_f32

            return bf16_to_f32(arr)
        return np.asarray(arr, dtype=np.float32)
    if target_dtype == "bfloat16":
        if arr.dtype == ml_dtypes.bfloat16:
            return np.asarray(arr)
        from ltx2_tpu.loader.native import f32_to_bf16

        return f32_to_bf16(np.asarray(arr, np.float32))
    return np.asarray(arr).astype(np.dtype(jnp.dtype(target_dtype).name))


def load_flat_diffusion_weights(
    path: str,
    include_audio: bool = False,
    target_dtype: str = "bfloat16",
    fp32_keys: Tuple[str, ...] = ("scale_shift_table", "adaln", "norm"),
    keep_fp8: bool = False,
    quantize_int8: bool = False,
) -> Dict[str, np.ndarray]:
    """Stream `model.diffusion_model.*` tensors -> flat {tree-key: np array}.

    AdaLN tables and norm weights stay fp32 (parity hazard #1, SURVEY.md);
    matmul weights go to `target_dtype`. With keep_fp8, fp8-E4M3 weights
    stay quantized and their per-tensor scales land beside them as
    `<name>_scale` leaves — the DiT dequantizes at use (ops/common.linear),
    halving weight HBM (serving mode). With quantize_int8, eligible matmul
    weights are W8A8-quantized at load (loader/int8.py; `<name>_cscale`
    per-out-channel scales beside int8 weights).
    """
    if keep_fp8 and quantize_int8:
        raise ValueError("keep_fp8 and quantize_int8 are mutually exclusive")
    from ltx2_tpu.loader.int8 import int8_eligible, quantize_array_int8

    f = SafetensorsFile(path)
    fp8_scales = {
        k.replace(".weight_scale", ".weight"): k
        for k in f.keys()
        if k.endswith(".weight_scale")
    }
    out: Dict[str, np.ndarray] = {}
    for key in f.keys():
        if not key.startswith(DIFFUSION_PREFIX) or key.endswith("_scale"):
            continue
        short = key[len(DIFFUSION_PREFIX):]
        tree_key = convert_checkpoint_key(short, include_audio=include_audio)
        if tree_key is None:
            continue
        if keep_fp8 and key in fp8_scales:
            out[tree_key] = np.asarray(f.get(key))
            out[tree_key + "_scale"] = np.asarray(
                np.asarray(f.get(fp8_scales[key])).reshape(()), np.float32
            )
            continue
        arr = _dequantize(f, key, f.get(key), fp8_scales)
        converted = _convert_arr(arr, tree_key, target_dtype, fp32_keys)
        if quantize_int8 and int8_eligible(tree_key):
            q, cscale = quantize_array_int8(converted)
            out[tree_key] = q
            out[tree_key + "_cscale"] = cscale
        else:
            out[tree_key] = converted
    return out


_BLOCK_RE = re.compile(r"^transformer_blocks\.(\d+)\.(.+)$")


def structure_diffusion_weights(
    flat: Dict[str, np.ndarray],
    num_layers: Optional[int] = None,
    device_put: Optional[Callable[[str, np.ndarray], jnp.ndarray]] = None,
) -> Params:
    """Flat keys -> nested param tree with transformer blocks STACKED along
    the layer axis (the scan layout).

    device_put(tree_path, np_array) -> device array lets the caller control
    placement/sharding per leaf; defaults to jnp.asarray.
    """
    if device_put is None:
        def device_put(_path, arr):
            return jnp.asarray(arr)

    top: Dict[str, np.ndarray] = {}
    per_block: Dict[int, Dict[str, np.ndarray]] = {}
    for key, arr in flat.items():
        m = _BLOCK_RE.match(key)
        if m:
            per_block.setdefault(int(m.group(1)), {})[m.group(2)] = arr
        else:
            top[key] = arr

    tree: Params = {}
    for key, arr in top.items():
        _set_nested(tree, key.split("."), device_put(key, arr))

    if per_block:
        n = num_layers if num_layers is not None else max(per_block) + 1
        # Union over ALL blocks, not block 0 (review r4: a leaf absent from
        # block 0 but present later silently vanished from the tree); a
        # leaf missing from SOME block cannot stack — fail loudly.
        sub_keys = sorted({k for d in per_block.values() for k in d})
        blocks: Params = {}
        for sub in sub_keys:
            missing = [i for i in range(n) if sub not in per_block.get(i, {})]
            if missing:
                raise ValueError(
                    f"transformer_blocks.*.{sub} is missing from block(s) "
                    f"{missing[:4]}{'...' if len(missing) > 4 else ''} — "
                    "stacked loading needs the leaf in every block"
                )
            stacked = np.stack([per_block[i][sub] for i in range(n)], axis=0)
            _set_nested(
                blocks, sub.split("."), device_put(f"transformer_blocks.{sub}", stacked)
            )
        tree["transformer_blocks"] = blocks
    return tree


def _set_nested(tree: dict, parts: List[str], value) -> None:
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def load_transformer_params_streamed(
    path: str,
    include_audio: bool = False,
    target_dtype: str = "bfloat16",
    fp32_keys: Tuple[str, ...] = ("scale_shift_table", "adaln", "norm"),
    num_layers: Optional[int] = None,
    device_put: Optional[Callable[[str, np.ndarray], jnp.ndarray]] = None,
    keep_fp8: bool = False,
    quantize_int8: bool = False,
) -> Params:
    """Streaming loader with BOUNDED host memory (SURVEY hard-part #4).

    The non-streamed path materializes the whole converted checkpoint as a
    host dict and then np.stack's the 48 blocks — a second full copy (~2x
    checkpoint peak; 86 GB+ for the 43 GB checkpoint). Here the safetensors
    header is parsed first (shapes/dtypes only, the file stays memmapped),
    then leaves are processed ONE AT A TIME:

    - top-level leaves: read -> convert -> device_put -> free.
    - per-block leaves: preallocate the stacked (L, ...) host array at the
      FINAL dtype, fill slot i directly from the mapped block-i tensor
      (conversion writes into the slot, no intermediate stack), device_put,
      free.

    Peak host RSS = the single largest stacked leaf (~L x one tensor; the
    48-layer FFN projection in bf16 is ~6.4 GB for the 22B model, ~3.2 GB
    under fp8 serving) + the OS page cache for the mmap — far under the
    checkpoint size, vs 2x checkpoint for the eager path. The reference
    bounds memory by streaming with gc every 100 tensors
    (weight_converter.py:415-435); the stacked scan layout needs this
    slot-fill design instead.
    """
    if keep_fp8 and quantize_int8:
        raise ValueError("keep_fp8 and quantize_int8 are mutually exclusive")
    from ltx2_tpu.loader.int8 import int8_eligible, quantize_array_int8

    if device_put is None:
        def device_put(_path, arr):
            return jnp.asarray(arr)

    f = SafetensorsFile(path)
    fp8_scales = {
        k.replace(".weight_scale", ".weight"): k
        for k in f.keys()
        if k.endswith(".weight_scale")
    }

    # ---- header-only planning pass ----------------------------------------
    top_keys: Dict[str, str] = {}  # tree_key -> checkpoint key
    per_block: Dict[str, Dict[int, str]] = {}  # sub_key -> {block_idx: ckpt key}
    for key in f.keys():
        if not key.startswith(DIFFUSION_PREFIX) or key.endswith("_scale"):
            continue
        short = key[len(DIFFUSION_PREFIX):]
        tree_key = convert_checkpoint_key(short, include_audio=include_audio)
        if tree_key is None:
            continue
        m = _BLOCK_RE.match(tree_key)
        if m:
            per_block.setdefault(m.group(2), {})[int(m.group(1))] = key
        else:
            top_keys[tree_key] = key

    def convert_one(ckpt_key: str, tree_key: str) -> Dict[str, np.ndarray]:
        """-> {suffix: array} ('' = the tensor, '_scale' = fp8 scale)."""
        if keep_fp8 and ckpt_key in fp8_scales:
            return {
                "": np.asarray(f.get(ckpt_key)),
                "_scale": np.asarray(
                    np.asarray(f.get(fp8_scales[ckpt_key])).reshape(()), np.float32
                ),
            }
        arr = _dequantize(f, ckpt_key, f.get(ckpt_key), fp8_scales)
        converted = _convert_arr(arr, tree_key, target_dtype, fp32_keys)
        if quantize_int8 and int8_eligible(tree_key):
            q, cscale = quantize_array_int8(converted)
            # int8 W8A8 at load (loader/int8.py): device HBM only ever
            # holds the int8 tree + per-out-channel scales.
            return {"": q, "_cscale": cscale}
        return {"": converted}

    tree: Params = {}

    # ---- top-level leaves: one tensor resident at a time -------------------
    for tree_key in sorted(top_keys):
        for suffix, arr in convert_one(top_keys[tree_key], tree_key).items():
            _set_nested(tree, (tree_key + suffix).split("."), device_put(tree_key + suffix, arr))

    # ---- stacked block leaves: one (L, ...) leaf resident at a time --------
    if per_block:
        n = num_layers if num_layers is not None else (
            max(max(d) for d in per_block.values()) + 1
        )
        blocks: Params = {}
        for sub in sorted(per_block):
            idx_map = per_block[sub]
            missing = [i for i in range(n) if i not in idx_map]
            if missing:
                raise ValueError(
                    f"transformer_blocks.*.{sub} is missing from block(s) "
                    f"{missing[:4]}{'...' if len(missing) > 4 else ''} — "
                    "stacked loading needs the leaf in every block"
                )
            # Convert each block exactly once and fill every suffix stack
            # from that one dict: a two-suffix leaf (int8 "_cscale", fp8
            # "_scale") must not re-run the dequant+convert+quantize
            # pipeline per suffix. The companion stacks are tiny (scales),
            # so peak host memory stays ~one stacked leaf.
            first = convert_one(idx_map[0], f"transformer_blocks.0.{sub}")
            stacks = {
                suffix: np.empty((n,) + proto.shape, proto.dtype)
                for suffix, proto in first.items()
            }
            for suffix, proto in first.items():
                stacks[suffix][0] = proto
            for i in range(1, n):
                block = convert_one(idx_map[i], f"transformer_blocks.{i}.{sub}")
                if set(block) != set(stacks):
                    # keep_fp8 with mixed per-block quantization (review
                    # r4): stacking raw fp8 codes into a bf16 stack (or
                    # dropping a scale) would be silent corruption.
                    raise ValueError(
                        f"transformer_blocks.{i}.{sub}: quantization layout "
                        f"{sorted(set(block))} differs from block 0's "
                        f"{sorted(set(stacks))} — keep_fp8 stacking needs a "
                        "uniform per-block layout (load with keep_fp8=False "
                        "to dequantize instead)"
                    )
                for suffix in stacks:
                    stacks[suffix][i] = block[suffix]
            for suffix in list(stacks):
                # pop + del: nothing may keep a stacked leaf alive into the
                # next sub's allocation (the one-leaf host-memory bound).
                stacked = stacks.pop(suffix)
                leaf_path = f"transformer_blocks.{sub}{suffix}"
                _set_nested(
                    blocks, (sub + suffix).split("."), device_put(leaf_path, stacked)
                )
                del stacked
        tree["transformer_blocks"] = blocks
    return tree


def load_transformer_params(
    path: str,
    include_audio: bool = False,
    target_dtype: str = "bfloat16",
    num_layers: Optional[int] = None,
    device_put: Optional[Callable[[str, np.ndarray], jnp.ndarray]] = None,
    keep_fp8: bool = False,
    streaming: bool = True,
    quantize_int8: bool = False,
) -> Params:
    """Full pipeline: stream safetensors -> key rewrite -> fp8 dequant ->
    stacked param tree on device (load_transformer_weights parity,
    weight_converter.py:318-446). streaming=True (default) bounds host RSS
    to ~one stacked leaf; False keeps the simple two-pass path (tests)."""
    if streaming:
        return load_transformer_params_streamed(
            path, include_audio=include_audio, target_dtype=target_dtype,
            num_layers=num_layers, device_put=device_put, keep_fp8=keep_fp8,
            quantize_int8=quantize_int8,
        )
    flat = load_flat_diffusion_weights(
        path, include_audio=include_audio, target_dtype=target_dtype,
        keep_fp8=keep_fp8, quantize_int8=quantize_int8,
    )
    return structure_diffusion_weights(flat, num_layers=num_layers, device_put=device_put)


def load_av_transformer_params(path: str, **kwargs) -> Params:
    """AudioVideo variant (weight_converter.py:527-553)."""
    return load_transformer_params(path, include_audio=True, **kwargs)


def flatten_params(tree: Params, prefix: str = "") -> Dict[str, jnp.ndarray]:
    """Param tree -> flat {dotted-key: leaf}; inverse of structuring (minus
    block stacking)."""
    out: Dict[str, jnp.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            out.update(flatten_params(value, path))
        else:
            out[path] = value
    return out
