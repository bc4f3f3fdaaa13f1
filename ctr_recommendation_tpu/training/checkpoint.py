"""Checkpointing: full train-state save/resume + best-metric export.

Fixes the reference's gaps (SURVEY §5.3-5.4): the reference saves model
weights only, best-AUC-only, to one fixed path (train_fibinet.py:97-99,
148-152) — training cannot resume, and a preemption loses everything. Here:

* periodic full-state checkpoints (params + BatchNorm stats + optimizer
  state + step + epoch + rng) via orbax — sharded arrays are saved per-host;
* a separate "best" export (params + model_state only) selected on the
  monitored metric, for serving — the analogue of FiBiNET_best.pth;
* ``latest_step`` / ``restore`` for preemption-safe resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        """``async_save``: resume-point saves return after the synchronous
        device->host snapshot; serialization + disk writes run in orbax's
        background thread, overlapped with the next epoch's compute. Safe
        with donated train-state buffers (orbax completes the D2H copy
        before returning). Readers (latest_step/restore/close) drain any
        in-flight save first."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self._best_dir = os.path.join(directory, "best")
        self._best_ckpt = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any, extra: dict | None = None) -> None:
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if not self._async:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save is durably on disk."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, step: int | None, target: Any) -> Any:
        """target: a pytree of like-shaped (possibly sharded) arrays."""
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        payload = {"state": target}
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(payload))
        return restored["state"]

    def save_best(self, params: Any, model_state: Any, metric: float, step: int) -> None:
        """Best-metric export for serving (reference: FiBiNET_best.pth).

        Crash-safe: the new export is written to a sibling temp directory and
        swapped in with atomic renames, so a preemption mid-save never loses
        the previous best (the serving artifact). A small JSON sidecar records
        the metric so a resumed run seeds its best-tracker from it instead of
        -inf (which would let a worse post-resume epoch overwrite the best).
        """
        import json
        import shutil

        # Under multi-controller training the orbax save itself is
        # coordinated, but the host-side rmtree/rename swap must run on
        # exactly one process (the checkpoint dir is shared) — two processes
        # racing the renames would crash the second one mid-epoch.
        primary = jax.process_index() == 0
        multiprocess = jax.process_count() > 1

        def _barrier(tag: str) -> None:
            if multiprocess:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"save_best_{tag}_{step}")

        path = os.path.join(self._best_dir, "export")
        tmp = path + ".tmp"
        old = path + ".old"
        if primary:
            for stale in (tmp, old):
                if os.path.exists(stale):
                    shutil.rmtree(stale)
        _barrier("pre")
        self._best_ckpt.save(
            tmp,
            {
                "params": params,
                "model_state": model_state,
                # numpy (not jax) scalars: orbax treats host numpy values
                # as replicated and serializes them fine in multi-host runs,
                # where a host-local jax scalar is rejected
                "metric": __import__("numpy").asarray(metric, dtype="float32"),
                "step": __import__("numpy").asarray(step, dtype="int32"),
            },
        )
        self._best_ckpt.wait_until_finished()
        _barrier("saved")
        if primary:
            if os.path.exists(path):
                os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
            meta = os.path.join(self._best_dir, "metric.json")
            with open(meta + ".tmp", "w") as f:
                json.dump({"metric": float(metric), "step": int(step)}, f)
            os.replace(meta + ".tmp", meta)
        _barrier("done")

    def best_metric(self) -> float | None:
        """Monitored metric of the current best export (None if no export)."""
        import json

        meta = os.path.join(self._best_dir, "metric.json")
        try:
            with open(meta) as f:
                return float(json.load(f)["metric"])
        except (OSError, ValueError, KeyError):
            return None

    def _best_export_path(self) -> str:
        path = os.path.join(self._best_dir, "export")
        if not os.path.exists(path) and os.path.exists(path + ".old"):
            return path + ".old"  # crashed between renames; previous best intact
        return path

    def restore_best(self, params_target: Any, state_target: Any) -> tuple[Any, Any]:
        path = self._best_export_path()
        restored = self._best_ckpt.restore(
            path,
            target={
                "params": params_target,
                "model_state": state_target,
                "metric": __import__("numpy").zeros((), "float32"),
                "step": __import__("numpy").zeros((), "int32"),
            },
        )
        return restored["params"], restored["model_state"]

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
