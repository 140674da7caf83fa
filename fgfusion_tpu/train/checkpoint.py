"""Checkpoint management (orbax) with best-score tracking.

Reference semantics (cvhelpers/torch_helpers.py:98-242 CheckPointManager):
- save `model-{step}` with model/optimizer state + step
- rotate, keeping `max_to_keep` most recent
- track the best checkpoint by validation score in a `checkpoints.txt`
  index; directory-resume loads the best step
- non-strict load with warnings for missing/unexpected keys.

Here the train state is a single pytree (params / batch_stats /
opt_state / step) checkpointed with orbax; `checkpoints.txt` keeps the
same best-index semantics so tooling parity holds.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

_logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, save_dir: str, max_to_keep: int = 6):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._mgr = self._open_mgr(create=True)
        self._index_path = os.path.join(self.save_dir, "checkpoints.txt")
        self.best_step, self.best_score = self._read_index()

    def _open_mgr(self, create: bool) -> ocp.CheckpointManager:
        """Build the manager with the full preservation policy — reused
        whenever the manager is re-opened (restore-retry path), so a
        manager that later saves never silently drops the rotation
        rules."""
        from orbax.checkpoint.checkpoint_managers import preservation_policy
        # Keep: the `max_to_keep` most recent, PLUS the best-scoring
        # checkpoint (so `load(best=True)` can never dangle after
        # rotation), PLUS a permanent snapshot every 3h (reference
        # trainer.py:34-35).
        policy = preservation_policy.AnyPreservationPolicy([
            preservation_policy.LatestN(n=self.max_to_keep),
            preservation_policy.BestN(
                get_metric_fn=lambda m: m["score"], n=1,
                keep_checkpoints_without_metrics=False),
            preservation_policy.EveryNSeconds(interval_secs=3 * 3600),
        ])
        return ocp.CheckpointManager(
            self.save_dir,
            options=ocp.CheckpointManagerOptions(
                create=create,
                preservation_policy=policy,
                enable_async_checkpointing=True),
        )

    # -- index ----------------------------------------------------------
    def _read_scores(self) -> dict:
        scores = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        scores[int(parts[0])] = float(parts[1])
        return scores

    def _read_index(self) -> Tuple[Optional[int], float]:
        scores = self._read_scores()
        if not scores:
            return None, float("-inf")
        best_step = max(scores, key=scores.get)
        return best_step, scores[best_step]

    def _append_index(self, step: int, score: float):
        with open(self._index_path, "a") as f:
            f.write(f"{step} {score}\n")

    # -- save/load -------------------------------------------------------
    def save(self, step: int, state: Any, score: float = 0.0) -> bool:
        """Returns True if this is the new best checkpoint."""
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics={"score": float(score)})
        self._append_index(step, score)
        is_best = score > self.best_score
        if is_best:
            self.best_step, self.best_score = step, score
        return is_best

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def load(self, state_template: Any, step: Optional[int] = None,
             best: bool = False) -> Tuple[Any, int]:
        """Restore into the template's structure. step=None picks the
        best (if tracked) else the latest — mirroring the reference's
        directory-resume behaviour (torch_helpers.py:206-212)."""
        if step is None and best:
            # Best among the steps that still exist on disk — rotation
            # (or an older index) may have removed the global best.
            existing = set(self._mgr.all_steps())
            scored = [s for s in existing if s in self._read_scores()]
            if scored:
                scores = self._read_scores()
                step = max(scored, key=scores.get)
                if step != self.best_step:
                    _logger.warning(
                        "best checkpoint %s no longer on disk; using best "
                        "surviving step %d (score %.4f)",
                        self.best_step, step, scores[step])
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.save_dir}")
        # A trainer process may be writing new steps concurrently
        # (async orbax saves); a restore that races a half-written step
        # directory can fail item validation. Re-open the manager and
        # retry a few times before giving up.
        last_err = None
        for attempt in range(3):
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(state_template))
                break
            except Exception as e:  # orbax raises bare ValueError here
                last_err = e
                _logger.warning(
                    "checkpoint restore of step %s failed (%s); retrying",
                    step, e)
                import time
                time.sleep(5.0)
                self._mgr = self._open_mgr(create=False)
        else:
            raise last_err
        _logger.info("restored checkpoint step %d from %s", step, self.save_dir)
        return restored, int(step)
