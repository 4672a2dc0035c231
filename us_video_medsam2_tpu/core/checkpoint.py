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
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz" if not path.endswith(".npz") else path)
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".meta.json"
    tmp_meta = meta_path + ".tmp"
    with open(tmp_meta, "w") as f:
        json.dump(scalars, f, default=str)
    os.replace(tmp_meta, meta_path)


def restore_checkpoint(path: str) -> Dict:
    npz_path = path if path.endswith(".npz") else path + ".npz"
    meta_path = npz_path[:-4] + ".meta.json"
    flat: Dict[str, Any] = dict(np.load(npz_path))
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            flat.update(json.load(f))
    return _unflatten(flat)


def restore_params(path: str) -> Dict:
    state = restore_checkpoint(path)
    return state.get("params", state)


def get_resume_checkpoint(save_dir: str) -> Optional[str]:
    """(reference train_utils.py:281-288); finds either backend's artifact."""
    path = os.path.join(save_dir, "checkpoint.npz")
    if os.path.exists(path):
        return path
    orbax_dir = os.path.join(save_dir, "checkpoint")
    if os.path.isdir(orbax_dir):
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


def restore_checkpoint_orbax(path: str, target: Optional[Dict] = None) -> Dict:
    """Restore an Orbax checkpoint directory. When `target` (a pytree of
    jax.ShapeDtypeStruct or arrays, possibly with shardings) is given, arrays
    are restored directly onto the target's shardings/devices."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            from flax import serialization

            target = serialization.to_state_dict(target)
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def save_checkpoint_any(path: str, state: Dict,
                        skip_patterns: Optional[List[str]] = None,
                        backend: str = "npz"):
    """Dispatch to the npz (single-file, host-gathered) or orbax
    (directory, sharding-aware) backend."""
    if backend == "orbax":
        return save_checkpoint_orbax(path, state, skip_patterns)
    return save_checkpoint(path, state, skip_patterns)


def restore_checkpoint_any(path: str, target: Optional[Dict] = None) -> Dict:
    if os.path.isdir(path):
        return restore_checkpoint_orbax(path, target)
    return restore_checkpoint(path)
