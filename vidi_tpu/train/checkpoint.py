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
        """Restore the newest checkpoint, falling back to older retained
        steps if it is unreadable (e.g. the job died mid-async-save). The
        reference's failure posture is defensive retries everywhere
        (builder.py:46-57 weight load x5, dataset/video.py:88-96 data
        resample); a torn final checkpoint is the resume-path analog."""
        steps = sorted(self.mgr.all_steps(), reverse=True)
        assert steps, "restore() called with no checkpoints on disk"
        last_err = None
        for step in steps:
            try:
                out = self.mgr.restore(step, args=ocp.args.Composite(
                    params=ocp.args.StandardRestore(params_like),
                    opt_state=ocp.args.StandardRestore(opt_state_like),
                ))
                if step != steps[0]:
                    print(f"checkpoint step {steps[0]} unreadable "
                          f"({type(last_err).__name__}); resumed from {step}")
                return step, out["params"], out["opt_state"]
            except Exception as e:  # torn/corrupt save — try the older one
                last_err = e
        raise last_err

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
