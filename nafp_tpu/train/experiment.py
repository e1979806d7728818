"""Experiment infrastructure: checkpointing, resume, metric logging.

Counterpart of the reference ``ExperimentHelper``
(``model/utils/experiment_helper.py:10-237``):
  - checkpoints saved once per epoch, so checkpoint index == epoch
    (reference convention via CheckpointManager step_counter, :100-122);
  - retention: max_to_keep=3 plus a keep-every-N-hours policy
    (:100-109 -> orbax ``keep_time_interval``);
  - auto-resume from the latest checkpoint when the directory exists
    (:125-137);
  - TensorBoard scalar/image logging (:144-237) when available, mirrored to
    a ``metrics.jsonl`` that needs no TB install to read.

State checkpointed: params, optimizer state, epoch, PRNG key — everything
needed for exact resume (the reference restores optimizer.iterations via
tf.train.Checkpoint; here the whole optax state tree rides along).
"""
from __future__ import annotations

import datetime
import json
import os
from typing import Any, Dict, Optional


import numpy as np
import orbax.checkpoint as ocp


class ExperimentHelper:
    def __init__(self,
                 checkpoint_name: str,
                 cfg: Dict[str, Any],
                 max_to_keep: int = 3):
        self.checkpoint_name = checkpoint_name
        self.cfg = cfg
        log_root = cfg["DIR"]["LOG_ROOT_DIR"]
        self.ckpt_dir = os.path.abspath(
            os.path.join(log_root, "checkpoint", checkpoint_name))
        keep_hours = float(cfg["TRAIN"].get("CHECKPOINT_KEEP_N_HOUR", 1) or 0)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_time_interval=(datetime.timedelta(hours=keep_hours)
                                if keep_hours else None),
            create=True)
        self.manager = ocp.CheckpointManager(self.ckpt_dir, options=options)

        # Metrics sinks.
        self.log_dir = os.path.join(
            log_root, "fit", checkpoint_name,
            datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if cfg["TRAIN"].get("TENSORBOARD", True):
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(self.log_dir)
            except Exception:
                pass

        self.epoch = 1  # 1-based like the reference (:58)

    # ------------------------------------------------------------------
    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_or_init(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Resume from latest checkpoint if one exists (reference :125-137)."""
        latest = self.manager.latest_step()
        if latest is None:
            print(f"[experiment] no checkpoint in {self.ckpt_dir}; "
                  "starting fresh")
            return state
        restored = self.manager.restore(
            latest, args=ocp.args.StandardRestore(state))
        self.epoch = latest + 1
        print(f"[experiment] restored epoch {latest} from {self.ckpt_dir}; "
              f"resuming at epoch {self.epoch}")
        return restored

    def save(self, epoch: int, state: Dict[str, Any]) -> None:
        self.manager.save(epoch, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def restore_at(self, epoch: int, state: Dict[str, Any]) -> Dict[str, Any]:
        return self.manager.restore(epoch, args=ocp.args.StandardRestore(state))

    # ------------------------------------------------------------------
    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def log_image(self, tag: str, matrix: np.ndarray, step: int) -> None:
        """Min-max-normalized matrix image."""
        if self._tb is None:
            return
        m = np.asarray(matrix, np.float32)
        lo, hi = m.min(), m.max()
        img = (m - lo) / (hi - lo + 1e-12)
        self._tb.add_image(tag, img[None, :, :], step)

    def log_sim_images(self, tag: str, logits: np.ndarray, step: int) -> None:
        """Pre/post-softmax similarity-matrix pair (reference
        write_image_tensorboard, experiment_helper.py:213-237).

        ``logits`` are the loss's returned similarity logits (rows = local
        anchors, cols = [ab, aa] blocks). The post-softmax image shows the
        row-wise attention the CE loss actually sees.
        """
        if self._tb is None:
            return
        m = np.asarray(logits, np.float32)
        self.log_image(f"{tag}/pre_softmax", m, step)
        z = m - m.max(axis=1, keepdims=True)
        e = np.exp(z)
        self.log_image(f"{tag}/post_softmax", e / e.sum(axis=1, keepdims=True),
                       step)

    def update_minitest_acc(self, accs_by_scope, scopes, key_str: str,
                            step: int) -> None:
        """Per-scope top-1 accuracy scalars (reference :190-209)."""
        top1 = accs_by_scope[0]
        for s, acc in zip(scopes, top1):
            self.log_scalar(f"mini_search/top1_{key_str}_scope{s}", acc, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
