"""Training state persistence: Orbax checkpoints + reference-format export.

The reference has a load-only hub — its checkpoint is a bare prompt-embedding
tensor, no optimizer state, no resume (reference: debias_clip/model/clip.py:
75-81; SURVEY.md §5).  Here training state (prompt array, adversary params,
both optimizer states, step counter, best-NDKL tracking) checkpoints with
Orbax and can be exported to the reference's ``.pt`` format so the upstream
repo can load our trained prompts drop-in.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_checkpoint(directory: str, trainer, step: Optional[int] = None) -> str:
    """Checkpoint an AdversarialTrainer with Orbax.  Returns the ckpt path."""
    import orbax.checkpoint as ocp

    step = int(step if step is not None else trainer.step_count)
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    state = {
        "debias_tokens": trainer.model.debias_tokens,
        "adversary_params": trainer.adversary_params,
        "prompt_opt_state": trainer.prompt_opt_state,
        "adv_opt_state": trainer.adv_opt_state,
        "meta": {
            "step": np.asarray(trainer.step_count),
            "best_ndkl": np.asarray(trainer.best_ndkl),
            "best_tokens": (
                trainer.best_tokens
                if trainer.best_tokens is not None
                else np.zeros_like(np.asarray(trainer.model.debias_tokens))
            ),
            "has_best": np.asarray(trainer.best_tokens is not None),
        },
    }
    # layer-training mode mutates CLIP weights and the joint optimizer holds
    # their Adam moments — restoring those against reverted pretrained weights
    # would be inconsistent, so the weights checkpoint too
    if getattr(trainer, "grad_mask", None) is not None:
        state["clip_params"] = trainer.model.clip_params
        # best-NDKL selection in layer mode pairs tokens WITH the weights
        # they were evaluated against
        best_cp = getattr(trainer, "best_clip_params", None)
        state["best_clip_params"] = (
            best_cp if best_cp is not None
            else jax.tree.map(np.zeros_like, _host_tree(trainer.model.clip_params)))
        state["meta"]["has_best_clip"] = np.asarray(best_cp is not None)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def _host_tree(tree):
    return jax.tree.map(np.asarray, tree)


def restore_checkpoint(path: str, trainer) -> None:
    """Restore trainer state in place from an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    template = {
        "debias_tokens": trainer.model.debias_tokens,
        "adversary_params": trainer.adversary_params,
        "prompt_opt_state": trainer.prompt_opt_state,
        "adv_opt_state": trainer.adv_opt_state,
        "meta": {
            "step": np.asarray(0),
            "best_ndkl": np.asarray(0.0),
            "best_tokens": np.zeros_like(np.asarray(trainer.model.debias_tokens)),
            "has_best": np.asarray(False),
        },
    }
    if getattr(trainer, "grad_mask", None) is not None:
        template["clip_params"] = trainer.model.clip_params
        template["best_clip_params"] = _host_tree(trainer.model.clip_params)
        template["meta"]["has_best_clip"] = np.asarray(False)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            state = ckptr.restore(path, args=ocp.args.PyTreeRestore(template))
        except (ValueError, KeyError) as e:
            state = None
            if "best_clip_params" in template:
                # checkpoints written before the best_clip_params entry:
                # retry once with the legacy layer-mode template
                legacy = dict(template)
                legacy.pop("best_clip_params")
                legacy["meta"] = {k: v for k, v in template["meta"].items()
                                  if k != "has_best_clip"}
                try:
                    state = ckptr.restore(
                        path, args=ocp.args.PyTreeRestore(legacy))
                except (ValueError, KeyError):
                    state = None
            if state is None:
                raise ValueError(
                    f"restoring checkpoint {path} failed ({e!r}). If the "
                    "checkpoint file is intact, the usual cause is a trainer "
                    "state-tree mismatch: TrainConfig optimizer settings "
                    "(lr_schedule/grad_clip_norm) or the layer-training config "
                    "changed between save and resume — the optimizer state "
                    "structure must match the one that wrote the checkpoint. "
                    "A truncated/corrupted checkpoint or an orbax version "
                    "change fails the same way."
                ) from e
    if "clip_params" in state:
        trainer.model.clip_params = state["clip_params"]
    trainer.model.debias_tokens = state["debias_tokens"]
    trainer.adversary_params = state["adversary_params"]
    trainer.prompt_opt_state = state["prompt_opt_state"]
    trainer.adv_opt_state = state["adv_opt_state"]
    trainer.step_count = int(state["meta"]["step"])
    trainer.best_ndkl = float(state["meta"]["best_ndkl"])
    if bool(state["meta"]["has_best"]):
        trainer.best_tokens = np.asarray(state["meta"]["best_tokens"])
    if bool(np.asarray(state["meta"].get("has_best_clip", False))):
        trainer.best_clip_params = state["best_clip_params"]


def latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-step checkpoint path under ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(os.path.abspath(directory), max(steps)[1])


def export_reference_pt(trainer, path: str, use_best: bool = True) -> str:
    """Export prompt embeddings in the reference's bare-tensor .pt format
    (drop-in loadable by the upstream hub, model/clip.py:75-81)."""
    from ..models.convert import save_debias_prompt_pt

    tokens = (
        trainer.best_tokens
        if (use_best and trainer.best_tokens is not None)
        else np.asarray(trainer.model.debias_tokens)
    )
    save_debias_prompt_pt(tokens, path)
    return path
