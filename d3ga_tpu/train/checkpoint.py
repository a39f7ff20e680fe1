"""Checkpoint save/restore (orbax-backed, with a numpy fallback).

Mirrors the reference cadence/semantics
(`/root/reference/models/trainer.py:145-209`): save (params, opt_state,
step) every checkpoint_n_steps into run_dir/checkpoints/chkpnt{step:06d},
restore the latest (or a requested step); non-strict restore for eval.
"""

import os
import re
from glob import glob
from typing import Any, Optional, Tuple

import jax
import numpy as np

CKPT_RE = re.compile(r"chkpnt(\d+)")


def _ckpt_dir(run_dir: str) -> str:
    return os.path.join(run_dir, "checkpoints")


def save_checkpoint(run_dir: str, step: int, params, opt_state=None, name=None):
    path = os.path.abspath(
        os.path.join(_ckpt_dir(run_dir), name or f"chkpnt{step:06d}")
    )
    os.makedirs(path, exist_ok=True)
    bundle = {"params": params, "opt_state": opt_state, "step": step}
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "state"), bundle, force=True)
    except Exception:
        _save_npz(os.path.join(path, "state.npz"), bundle)
    return path


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return flat, treedef


def _save_npz(path, bundle):
    flat, _ = jax.tree_util.tree_flatten_with_path(bundle)
    arrays = {}
    for keypath, leaf in flat:
        key = "/".join(str(k) for k in keypath)
        arrays[key] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def _load_npz(path, like):
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(k) for k in keypath)
        leaves.append(data[key] if key in data else leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(run_dir: str, step: Optional[int] = None) -> Optional[str]:
    path = _ckpt_dir(run_dir)
    if not os.path.exists(path):
        return None
    ckpts = sorted(glob(os.path.join(path, "chkpnt*")))
    if not ckpts:
        return None
    if step is not None:
        for c in ckpts:
            m = CKPT_RE.search(os.path.basename(c))
            if m and int(m.group(1)) == int(step):
                return c
    return ckpts[-1]


def restore_checkpoint(
    run_dir: str,
    like_params,
    like_opt_state=None,
    step: Optional[int] = None,
) -> Tuple[Any, Any, int]:
    """Returns (params, opt_state, step); falls back to the provided
    templates at step 0 if no checkpoint exists."""
    path = latest_checkpoint(run_dir, step)
    if path is None:
        return like_params, like_opt_state, 0
    bundle_like = {"params": like_params, "opt_state": like_opt_state, "step": 0}
    path = os.path.abspath(path)
    orbax_path = os.path.join(path, "state")
    npz_path = os.path.join(path, "state.npz")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        # Restore every leaf as HOST numpy: replaying the checkpoint's
        # recorded device sharding fails across topologies (a TPU-written
        # checkpoint refuses to restore on CPU and vice versa); jit puts
        # the arrays back on device on first use.
        as_np = lambda _: ocp.RestoreArgs(restore_type=np.ndarray)
        try:
            bundle = ckptr.restore(
                orbax_path,
                item=bundle_like,
                restore_args=jax.tree.map(as_np, bundle_like),
            )
        except ValueError:
            # Template mismatch (e.g. eval restores params only while
            # the checkpoint stores an optimizer state): generic restore.
            meta = ckptr.metadata(orbax_path)
            # StepMetadata wraps the stored pytree in .item_metadata
            tree = getattr(meta, "item_metadata", meta)
            raw = ckptr.restore(
                orbax_path, restore_args=jax.tree.map(as_np, tree)
            )
            bundle = {
                "params": raw.get("params", like_params),
                "opt_state": like_opt_state,
                "step": raw.get("step", 0),
            }
    else:
        bundle = _load_npz(npz_path, bundle_like)
    return bundle["params"], bundle["opt_state"], int(bundle["step"])
