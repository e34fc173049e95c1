"""Checkpointing: full-train-state save/restore with latest/best + auto-resume.

Semantics parity with the reference trainer (/root/reference/trainer.py:10-15):
``latest`` is written every eval interval, ``best`` whenever validation loss
improves. Differences, by design:

- a checkpoint is the FULL :class:`TrainState` pytree (params, optimizer
  state, step, RNG key, best-val) — the reference loses everything but Keras
  weights on crash (models/model01.py:263-267, SURVEY.md §5);
- auto-resume: ``restore_latest`` at startup continues a run exactly where
  it stopped (the reference never calls load at startup);
- Orbax (async-capable, multi-host-aware) instead of Keras ``save_weights``;
  no warm-build-before-load problem exists (cf. the TODOs at
  /root/reference/models/model.py:9-13).
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from vae_mdl_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, directory: str, name: str, async_save: bool = True):
        self.base = os.path.abspath(os.path.join(directory, name))
        os.makedirs(self.base, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._async = async_save

    def _path(self, tag: str) -> str:
        return os.path.join(self.base, tag)

    def save(self, state: TrainState, tag: str = "latest") -> None:
        """Async by default: Orbax serialises in the background while
        training continues; the next save (or ``wait``) joins it. The
        on-disk checkpoint is only renamed into place when complete, so a
        crash mid-save leaves the previous checkpoint intact."""
        self._ckptr.save(self._path(tag), state, force=True)
        if not self._async:
            self._ckptr.wait_until_finished()

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def restore(self, target: TrainState, tag: str = "latest") -> TrainState:
        self.wait()  # join any in-flight save of the same tag
        return self._ckptr.restore(self._path(tag), target)

    def has(self, tag: str) -> bool:
        self.wait()
        return os.path.isdir(self._path(tag))

    def restore_latest(self, target: TrainState) -> Optional[TrainState]:
        """Auto-resume hook: returns the restored state or None."""
        if self.has("latest"):
            return self.restore(target, "latest")
        return None
