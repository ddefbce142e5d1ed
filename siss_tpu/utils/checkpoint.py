"""Checkpoint save/restore with rotation and latest-scan.

TPU-native replacement for the reference's Accelerate ``save_state`` +
diffusers-subfolder hooks (``delete_celeb.py:137-147,788-825``;
``delete_sd.py:502-536,780-801``): orbax-backed pytree checkpoints of
``TrainState`` (params, optimizer, EMA, step), ``checkpoint-<step>``
directory naming, ``checkpoints_total_limit`` rotation, and
``resume_from_checkpoint="latest"`` scanning.
"""

from __future__ import annotations

import os
import queue
import re
import shutil
import threading
from typing import Any, Optional


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """``async_save=True`` moves the disk write (and rotation) to one
    background worker thread: the device→host copy still happens
    synchronously in ``save_bundle`` — so donated training-state buffers
    can be reused by the next step immediately — but the multi-second
    orbax write of a large state (SD's ~10G) no longer stalls the train
    loop. ``wait()`` drains pending writes (call before process exit /
    preemption handoff); write errors re-raise there."""

    def __init__(self, output_dir: str, total_limit: Optional[int] = None,
                 async_save: bool = False):
        self.root = os.path.abspath(output_dir)
        self.total_limit = total_limit
        os.makedirs(self.root, exist_ok=True)
        self.async_save = async_save
        self._queue: Optional[queue.Queue] = None
        self._worker: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    # ----------------------------------------------------------- async worker
    def _submit(self, job) -> None:
        if self._worker is None:
            self._queue = queue.Queue()
            self._worker = threading.Thread(target=self._drain, daemon=True,
                                            name="ckpt-writer")
            self._worker.start()
        self._queue.put(job)

    def _drain(self) -> None:
        while True:
            job = self._queue.get()
            try:
                if job is not None:
                    job()
            except BaseException as e:  # surfaced on the next wait()
                self._error = e
            finally:
                self._queue.task_done()

    def wait(self) -> None:
        """Block until queued checkpoint writes finish; re-raise the first
        write error if one occurred."""
        if self._queue is not None:
            self._queue.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    # ----------------------------------------------------------------- paths
    def _path(self, step: int) -> str:
        return os.path.join(self.root, f"checkpoint-{step}")

    def list_checkpoints(self):
        out = []
        if not os.path.isdir(self.root):
            return out
        for name in os.listdir(self.root):
            m = re.fullmatch(r"checkpoint-(\d+)", name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.root, name)))
        return sorted(out)

    def latest(self) -> Optional[str]:
        """'latest' resume-scan (``delete_sd.py:780-801``)."""
        cps = self.list_checkpoints()
        return cps[-1][1] if cps else None

    # ------------------------------------------------------------------ save
    def save(self, step: int, state: Any):
        ocp = _ocp()
        path = self._path(step)
        tmp = path + ".tmp"
        for stale in (path, tmp):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, state)
        os.rename(tmp, path)
        self._rotate()
        return path

    def save_bundle(self, step: int, items: dict):
        """Save named sub-checkpoints under one checkpoint-<step>/ dir —
        mirrors the reference's accelerate-state + ``unet/``/``unet_ema/``
        diffusers subfolders layout (``delete_celeb.py:137-147``).

        Atomic: written to a ``.tmp`` dir and renamed on completion so a
        mid-save kill (preemption) never leaves a partial bundle that
        ``latest()`` would resolve to. With ``async_save`` the items are
        host-copied here (donation-safe) and written by the worker."""
        path = self._path(step)

        if self.async_save:
            import jax

            items = {k: jax.device_get(v) for k, v in items.items() if v is not None}
            self._submit(lambda: self._write_bundle(path, items))
            return path
        self._write_bundle(path, items)
        return path

    def _write_bundle(self, path: str, items: dict) -> None:
        ocp = _ocp()
        tmp = path + ".tmp"
        for stale in (path, tmp):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        os.makedirs(tmp)
        with ocp.StandardCheckpointer() as ckptr:
            for name, item in items.items():
                if item is not None:
                    ckptr.save(os.path.join(tmp, name), item)
        os.rename(tmp, path)
        self._rotate()

    def restore_item(self, checkpoint_path: str, name: str, template: Any) -> Any:
        """Restore one named sub-checkpoint (e.g. 'unet_ema') from a
        checkpoint dir; ``checkpoint_path`` may be 'latest'."""
        ocp = _ocp()
        path = self.latest() if checkpoint_path == "latest" else checkpoint_path
        if path is None:
            raise FileNotFoundError(f"No checkpoints under {self.root}")
        if not os.path.isabs(path) and not os.path.exists(path):
            path = os.path.join(self.root, path)
        sub = os.path.join(path, name)
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(sub, template)

    def _rotate(self):
        """``checkpoints_total_limit`` rotation (``delete_celeb.py:788-825``)."""
        if self.total_limit is None:
            return
        cps = self.list_checkpoints()
        excess = len(cps) - self.total_limit
        for _, path in cps[:max(excess, 0)]:
            shutil.rmtree(path, ignore_errors=True)

    # --------------------------------------------------------------- restore
    def restore(self, path_or_latest: str, template: Any) -> Any:
        """Restore into the structure of ``template`` (a concrete TrainState
        or params pytree with matching shapes/dtypes)."""
        ocp = _ocp()
        path = self.latest() if path_or_latest == "latest" else path_or_latest
        if path is None:
            raise FileNotFoundError(f"No checkpoints under {self.root}")
        if not os.path.isabs(path) and not os.path.exists(path):
            path = os.path.join(self.root, path)
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path), template)

    def step_of(self, path: str) -> int:
        m = re.search(r"checkpoint-(\d+)", path)
        return int(m.group(1)) if m else 0
