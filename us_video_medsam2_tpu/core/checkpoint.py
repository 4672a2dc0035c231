"""Checkpoint save/resume (Orbax) + parameter freezing/filters.

Replaces reference training/trainer.py:324-445 + training/utils/checkpoint_utils.py:
- atomic save of {params, opt_state, step, epoch, best_meter_values} (the
  reference writes tmp + mv, trainer.py:363-380; Orbax writes atomically)
- auto-resume from <save_dir>/checkpoint (train_utils.py:281-288)
- unix-pattern include/exclude of saved parameters (checkpoint_utils.py:30-88)
- `model_weight_initializer`: seed training from a SAM2.1 .pt with key-exclusion
  kernels and ignorable missing keys (checkpoint_utils.py:247-360, wired at
  GFTE_3.yaml:319-336)
"""

from __future__ import annotations

import fnmatch
import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


_EMPTY = "__empty_dict__"

# --------------------------------------------------------------- format marker
# RoPE q/k projections are stored channel-permuted into the half-split layout
# expected by apply_rope_halfsplit (ops/posenc.py::rope_halfsplit_perm,
# docs/PARITY.md #13). Checkpoints written before that change hold torch's
# interleaved RoPE-pair layout and would load without error but silently
# produce wrong memory-attention outputs. Every save therefore stamps a format
# marker, and every restore of a tree containing RoPE projections checks it.

CKPT_FORMAT_VERSION = 2
CKPT_ROPE_LAYOUT = "halfsplit"
_FORMAT_PREFIX = "_ckpt_format/"
_ORBAX_FORMAT_FILE = "us_medsam2_ckpt_format.json"


def _format_scalars() -> Dict[str, Any]:
    return {
        _FORMAT_PREFIX + "version": CKPT_FORMAT_VERSION,
        _FORMAT_PREFIX + "rope_layout": CKPT_ROPE_LAYOUT,
    }


def _is_rope_proj(key: str) -> bool:
    """True for flat '/'-joined paths of RoPE-rotated q/k projections (only the
    memory-attention self/cross attention modules apply RoPE; the mask decoder's
    `self_attn` is plain attention and is never permuted)."""
    return (
        "memory_attention/" in key
        and ("/self_attn/" in key or "/cross_attn_image/" in key)
        and (
            key.endswith("q_proj/kernel")
            or key.endswith("q_proj/bias")
            or key.endswith("k_proj/kernel")
            or key.endswith("k_proj/bias")
        )
    )


def migrate_rope_layout(params: Dict, num_heads: int) -> Dict:
    """Permute the RoPE q/k projections of an old interleaved-layout tree into
    the half-split layout — the same transform the torch importer applies
    (core/import_torch.py::_map_attention)."""
    from us_video_medsam2_tpu.ops.posenc import rope_halfsplit_perm

    flat = _flatten(params)
    out = {}
    for k, v in flat.items():
        if _is_rope_proj(k):
            v = np.asarray(v)
            perm = rope_halfsplit_perm(v.shape[-1], num_heads)
            v = v[..., perm]
        out[k] = v
    return _unflatten(out)


def _check_rope_layout(
    flat: Dict[str, Any],
    fmt: Dict[str, Any],
    path: str,
    assume_rope_layout: Optional[str],
    rope_num_heads: Optional[int],
) -> Dict[str, Any]:
    """Validate/migrate the RoPE projection layout of a restored flat tree."""
    rope_keys = [k for k in flat if _is_rope_proj(k)]
    if not rope_keys:
        return flat
    layout = fmt.get("rope_layout", assume_rope_layout)
    if layout == CKPT_ROPE_LAYOUT:
        return flat
    if layout == "interleaved":
        if rope_num_heads is None:
            raise RuntimeError(
                f"checkpoint {path!r} has interleaved RoPE layout; pass "
                "rope_num_heads (memory_attention.num_heads) to migrate it"
            )
        import logging

        logging.warning(
            "checkpoint %s: migrating %d RoPE q/k projections from interleaved "
            "to half-split layout", path, len(rope_keys)
        )
        for k in rope_keys:
            from us_video_medsam2_tpu.ops.posenc import rope_halfsplit_perm

            v = np.asarray(flat[k])
            flat[k] = v[..., rope_halfsplit_perm(v.shape[-1], rope_num_heads)]
        return flat
    raise RuntimeError(
        f"checkpoint {path!r} predates the RoPE half-split layout marker "
        f"(format {fmt or 'none'}): its memory-attention q/k projections may be "
        "in torch's interleaved layout, which would silently produce wrong "
        "outputs. If it was saved by this framework after the half-split "
        "change, pass assume_rope_layout='halfsplit'; if it is older, pass "
        "assume_rope_layout='interleaved' plus rope_num_heads to migrate "
        "(or call core.checkpoint.migrate_rope_layout)."
    )


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        if not tree and prefix:
            # preserve empty subtrees (e.g. optax EmptyState) so the restored
            # structure matches exactly
            out["/".join(prefix + (_EMPTY,))] = np.zeros((0,), np.int8)
            return out
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat: Dict[str, Any]):
    tree: Dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        if parts[-1] == _EMPTY:
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            continue
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def exclude_params_matching_unix_pattern(patterns: List[str], state_dict: Dict):
    """(reference checkpoint_utils.py:30-60)"""
    flat = _flatten(state_dict)
    keep = {
        k: v
        for k, v in flat.items()
        if not any(fnmatch.fnmatch(k, p) for p in patterns)
    }
    return _unflatten(keep)


def filter_params_matching_unix_pattern(patterns: List[str], state_dict: Dict):
    flat = _flatten(state_dict)
    keep = {k: v for k, v in flat.items() if any(fnmatch.fnmatch(k, p) for p in patterns)}
    return _unflatten(keep)


def save_checkpoint(path: str, state: Dict, skip_patterns: Optional[List[str]] = None):
    """Save a pytree checkpoint as an .npz + json metadata (atomic via tmp+rename,
    matching trainer.py:363-380). Arbitrary pytrees (optax namedtuple states,
    flax structs) are converted to nested dicts via flax.serialization first."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = serialization.to_state_dict(state)
    flat = _flatten(jax.tree.map(np.asarray, state))
    if skip_patterns:
        flat = {
            k: v for k, v in flat.items()
            if not any(fnmatch.fnmatch(k, p) for p in skip_patterns)
        }
    arrays = {k: v for k, v in flat.items() if isinstance(v, np.ndarray)}
    scalars = {
        k: (v.item() if isinstance(v, np.generic) else v)
        for k, v in flat.items()
        if not isinstance(v, np.ndarray)
    }
    scalars.update(_format_scalars())
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz" if not path.endswith(".npz") else path)
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".meta.json"
    tmp_meta = meta_path + ".tmp"
    with open(tmp_meta, "w") as f:
        json.dump(scalars, f, default=str)
    os.replace(tmp_meta, meta_path)


def restore_checkpoint(
    path: str,
    assume_rope_layout: Optional[str] = None,
    rope_num_heads: Optional[int] = None,
) -> Dict:
    npz_path = path if path.endswith(".npz") else path + ".npz"
    meta_path = npz_path[:-4] + ".meta.json"
    flat: Dict[str, Any] = dict(np.load(npz_path))
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            flat.update(json.load(f))
    fmt = {
        k[len(_FORMAT_PREFIX):]: flat.pop(k)
        for k in [k for k in flat if k.startswith(_FORMAT_PREFIX)]
    }
    flat = _check_rope_layout(flat, fmt, path, assume_rope_layout, rope_num_heads)
    return _unflatten(flat)


def read_checkpoint_format(path: str) -> Dict[str, Any]:
    """Read the format marker of an npz or orbax checkpoint ({} if unmarked)."""
    if os.path.isdir(path):
        fp = os.path.join(path, _ORBAX_FORMAT_FILE)
        if os.path.exists(fp):
            with open(fp) as f:
                return json.load(f)
        return {}
    meta_path = (path if path.endswith(".npz") else path + ".npz")[:-4] + ".meta.json"
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        meta = json.load(f)
    return {
        k[len(_FORMAT_PREFIX):]: v
        for k, v in meta.items()
        if k.startswith(_FORMAT_PREFIX)
    }


def restore_params(
    path: str,
    assume_rope_layout: Optional[str] = None,
    rope_num_heads: Optional[int] = None,
) -> Dict:
    state = restore_checkpoint(path, assume_rope_layout, rope_num_heads)
    return state.get("params", state)


def get_resume_checkpoint(save_dir: str) -> Optional[str]:
    """(reference train_utils.py:281-288); finds either backend's artifact.
    When both an npz file and an orbax directory exist (e.g. after switching
    checkpoint_backend mid-run), the newer one by mtime wins so resume never
    silently restores a stale artifact."""
    npz_path = os.path.join(save_dir, "checkpoint.npz")
    orbax_dir = os.path.join(save_dir, "checkpoint")
    have_npz = os.path.exists(npz_path)
    have_orbax = os.path.isdir(orbax_dir)
    if have_npz and have_orbax:
        return npz_path if os.path.getmtime(npz_path) >= os.path.getmtime(orbax_dir) else orbax_dir
    if have_npz:
        return npz_path
    if have_orbax:
        return orbax_dir
    return None


def load_state_dict_into_params(
    params: Dict,
    loaded: Dict,
    strict: bool = True,
    ignore_missing_keys: Optional[List[str]] = None,
    ignore_unexpected_keys: Optional[List[str]] = None,
):
    """Merge imported weights into an initialized tree with ignorable patterns
    (reference checkpoint_utils.py:330-361)."""
    cur = _flatten(params)
    new = _flatten(loaded)
    missing = [k for k in cur if k not in new]
    unexpected = [k for k in new if k not in cur]
    if ignore_missing_keys:
        missing = [
            k for k in missing
            if not any(fnmatch.fnmatch(k, p) for p in ignore_missing_keys)
        ]
    if ignore_unexpected_keys:
        unexpected = [
            k for k in unexpected
            if not any(fnmatch.fnmatch(k, p) for p in ignore_unexpected_keys)
        ]
    if strict and (missing or unexpected):
        raise RuntimeError(f"missing={missing[:5]} unexpected={unexpected[:5]}")
    merged = dict(cur)
    for k, v in new.items():
        if k in cur:
            assert cur[k].shape == np.shape(v), f"{k}: {cur[k].shape} vs {np.shape(v)}"
            merged[k] = v
    return _unflatten(merged)


# ----------------------------------------------------------------- orbax backend
# Optional Orbax-backed checkpointing for very large params/optimizer states:
# sharding-aware async-capable saves that restore directly onto a jax.sharding
# Mesh without a host-memory round trip (the npz backend gathers everything to
# host). Same call contract as save_checkpoint/restore_checkpoint; the backend
# is selected by path convention (a directory => orbax, a file => npz).


def save_checkpoint_orbax(path: str, state: Dict,
                          skip_patterns: Optional[List[str]] = None):
    """Save `state` as an Orbax StandardCheckpoint under directory `path`
    (atomic: orbax writes to a tmp dir then renames). skip_patterns filter
    flattened '/'-joined key paths like the npz backend."""
    import orbax.checkpoint as ocp
    from flax import serialization

    state = serialization.to_state_dict(state)
    if skip_patterns:
        flat = _flatten(state)
        flat = {
            k: v for k, v in flat.items()
            if not any(fnmatch.fnmatch(k, p) for p in skip_patterns)
        }
        state = _unflatten(flat)
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    with open(os.path.join(path, _ORBAX_FORMAT_FILE), "w") as f:
        json.dump({"version": CKPT_FORMAT_VERSION, "rope_layout": CKPT_ROPE_LAYOUT}, f)


def restore_checkpoint_orbax(
    path: str,
    target: Optional[Dict] = None,
    assume_rope_layout: Optional[str] = None,
    rope_num_heads: Optional[int] = None,
) -> Dict:
    """Restore an Orbax checkpoint directory. When `target` (a pytree of
    jax.ShapeDtypeStruct or arrays, possibly with shardings) is given, arrays
    are restored directly onto the target's shardings/devices."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            from flax import serialization

            target = serialization.to_state_dict(target)
            state = ckptr.restore(path, target)
        else:
            state = ckptr.restore(path)
    fmt = read_checkpoint_format(path)
    flat = _check_rope_layout(
        _flatten(state), fmt, path, assume_rope_layout, rope_num_heads
    )
    return _unflatten(flat)


def save_checkpoint_any(path: str, state: Dict,
                        skip_patterns: Optional[List[str]] = None,
                        backend: str = "npz"):
    """Dispatch to the npz (single-file, host-gathered) or orbax
    (directory, sharding-aware) backend."""
    if backend == "orbax":
        return save_checkpoint_orbax(path, state, skip_patterns)
    return save_checkpoint(path, state, skip_patterns)


def restore_checkpoint_any(
    path: str,
    target: Optional[Dict] = None,
    assume_rope_layout: Optional[str] = None,
    rope_num_heads: Optional[int] = None,
) -> Dict:
    if os.path.isdir(path):
        return restore_checkpoint_orbax(path, target, assume_rope_layout, rope_num_heads)
    return restore_checkpoint(path, assume_rope_layout, rope_num_heads)
