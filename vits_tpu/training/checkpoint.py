"""Checkpointing: dual-artifact convention via Orbax.

Behavioral reference: /root/reference/utils.py:24-116,133-138. The reference
saves `{name}_Train_{step}.pth` (discriminator + both optimizer states +
epoch) and `{name}_Eval_{step}.pth` (generator only — what serving loads);
resume picks the latest by step. Here: Orbax directories `train_{step}` (full
TrainState + epoch) and `eval_{step}` (g_params only), same split, plus the
`keep_ckpts` pruning the reference config promises but never implements
(SURVEY.md §5).

Partial/shape-safe loading (transfer learning, reference utils.py:73-88) is
provided by `merge_compatible`: only matching-path, matching-shape leaves are
taken from the loaded tree.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_steps(model_dir: str, prefix: str) -> list[int]:
    if not os.path.isdir(model_dir):
        return []
    steps = []
    for name in os.listdir(model_dir):
        m = re.fullmatch(rf"{prefix}_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(model_dir: str, prefix: str = "train") -> str | None:
    steps = _ckpt_steps(model_dir, prefix)
    if not steps:
        return None
    return os.path.join(model_dir, f"{prefix}_{steps[-1]}")


def save_checkpoint(
    model_dir: str,
    step: int,
    train_state,
    epoch: int,
    keep_ckpts: int = 3,
) -> None:
    """Save train_{step} (full state) and eval_{step} (g_params only)."""
    ckptr = ocp.StandardCheckpointer()
    payload_train = {"state": train_state, "epoch": epoch}
    ckptr.save(
        os.path.join(os.path.abspath(model_dir), f"train_{step}"), payload_train
    )
    ckptr.save(
        os.path.join(os.path.abspath(model_dir), f"eval_{step}"),
        {"g_params": train_state.g_params},
    )
    ckptr.wait_until_finished()
    if keep_ckpts and keep_ckpts > 0:
        for prefix in ("train", "eval"):
            steps = _ckpt_steps(model_dir, prefix)
            for s in steps[:-keep_ckpts]:
                path = os.path.join(model_dir, f"{prefix}_{s}")
                import shutil

                shutil.rmtree(path, ignore_errors=True)


def load_checkpoint(path: str, target) -> tuple:
    """Restore {state, epoch} from a train_{step} dir against `target`."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target={"state": target, "epoch": 0})
    return restored["state"], restored["epoch"]


def load_eval_params(path: str, target_g_params=None):
    """Restore generator params from an eval_{step} dir.

    With target=None restores the full saved tree raw (numpy) — serving
    inits only the inference subtree, and flax apply happily carries the
    extra (posterior/yin-decoder) params, which voice conversion needs.
    """
    ckptr = ocp.StandardCheckpointer()
    if target_g_params is None:
        restored = ckptr.restore(os.path.abspath(path))
    else:
        restored = ckptr.restore(
            os.path.abspath(path), target={"g_params": target_g_params}
        )
    return restored["g_params"]


def merge_compatible(init_tree, loaded_tree):
    """Take leaves from loaded_tree where path+shape match init_tree
    (reference utils.py:73-88 partial load)."""
    init_flat = jax.tree_util.tree_flatten_with_path(init_tree)[0]
    loaded_flat = dict(jax.tree_util.tree_flatten_with_path(loaded_tree)[0])
    out = {}
    used, skipped = 0, 0
    for path, leaf in init_flat:
        cand = loaded_flat.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out[path] = cand
            used += 1
        else:
            out[path] = leaf
            skipped += 1
    treedef = jax.tree_util.tree_structure(init_tree)
    leaves = [out[path] for path, _ in init_flat]
    return jax.tree_util.tree_unflatten(treedef, leaves), used, skipped
