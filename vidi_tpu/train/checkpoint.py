"""Orbax checkpointing with auto-resume.

Replaces HF Trainer + DeepSpeed ZeRO checkpointing (reference:
scripts/finetune.sh:37-39 save_steps/save_total_limit, train.py:206-208
auto-resume from the newest checkpoint-*)."""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def _manager(output_dir: str, save_total_limit: int = 2) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(output_dir, "checkpoints")),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=save_total_limit, create=True, enable_async_checkpointing=True),
    )


class Checkpointer:
    def __init__(self, output_dir: str, save_total_limit: int = 2):
        self.mgr = _manager(output_dir, save_total_limit)

    def save(self, step: int, params: Any, opt_state: Any):
        self.mgr.save(step, args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, params_like: Any, opt_state_like: Any
                ) -> Tuple[int, Any, Any]:
        step = self.mgr.latest_step()
        assert step is not None
        out = self.mgr.restore(step, args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_like),
            opt_state=ocp.args.StandardRestore(opt_state_like),
        ))
        return step, out["params"], out["opt_state"]

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
