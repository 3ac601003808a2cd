"""Checkpoint save/restore via Orbax (async) with keep-last-K retention.

TPU-native counterpart of the reference's DeepSpeed/torch checkpointing
(src/utils/misc_utils.py:69-253): sharded params/opt-state go through Orbax;
a small JSON metadata record carries (step, epoch, sampler seed) — the
reference reconstructs these by parsing log.csv (conf_utils.py:150-175).
Warm-start with head-key skipping (loader_utils.load_from_ckp:161-220) is
`restore_params(..., skip_prefixes=("score",))`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_mgr(directory: str, keep: int = 5):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class Checkpointer:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = _ckpt_mgr(self.directory, keep)

    def save(self, step: int, state, metadata: Optional[Dict[str, Any]] = None):
        import orbax.checkpoint as ocp

        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(metadata or {}),
        )
        self._mgr.save(step, args=args)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        """All retained checkpoint steps, ascending (reference eval_only
        iterates epoch_{i} dirs, finetune_mode.py:421-432)."""
        return sorted(self._mgr.all_steps())

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def close(self):
        self._mgr.close()


def restore_params_warmstart(
    ckpt_dir: str, params_template, skip_prefixes=("score",), step=None
):
    """Load params from a pretrain checkpoint into a fine-tune tree, keeping
    freshly-initialised values for head keys absent or skipped."""
    import orbax.checkpoint as ocp

    mgr = _ckpt_mgr(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    raw = mgr.restore(step, args=ocp.args.Composite(state=ocp.args.StandardRestore()))
    src_params = raw["state"]["params"]
    out = {}
    for key, val in params_template.items():
        if any(key.startswith(p) for p in skip_prefixes):
            out[key] = val
        elif key in src_params:
            src = src_params[key]
            same = jax.tree_util.tree_all(
                jax.tree_util.tree_map(
                    lambda a, b: np.shape(a) == np.shape(b), src, val
                )
            )
            out[key] = src if same else val
        else:
            out[key] = val
    mgr.close()
    return out


def save_run_config(output_dir: str, cfg_dict: Dict[str, Any]):
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config_final.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2, default=str)
