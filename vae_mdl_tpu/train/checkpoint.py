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

import jax
import jax.numpy as jnp
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

    def snapshots(self) -> list:
        """``step_<N>`` snapshot tags on disk, oldest first."""
        import re

        found = []
        for d in os.listdir(self.base):
            m = re.fullmatch(r"step_(\d+)", d)
            if m and os.path.isdir(self._path(d)):
                found.append((int(m.group(1)), d))
        return [tag for _, tag in sorted(found)]

    def prune_snapshots(self, keep: int) -> None:
        """Delete the oldest snapshots beyond ``keep`` (never touches
        ``latest``/``best``); joins in-flight saves first so a snapshot
        still being written is not removed under the writer. ``keep <= 0``
        is a no-op (keep everything) — never an instruction to delete the
        snapshot that was just written."""
        import shutil

        if keep <= 0:
            return
        # join in-flight saves FIRST: an async snapshot only appears on disk
        # when its rename-into-place completes, so listing before the join
        # would undercount and keep one stale snapshot forever
        self.wait()
        drop = self.snapshots()[:-keep]
        if drop and jax.process_index() == 0:  # one deleter on a shared FS
            for tag in drop:
                shutil.rmtree(self._path(tag), ignore_errors=True)

    def restore(self, target: TrainState, tag: str = "latest") -> TrainState:
        """Restore into ``target``'s structure, tolerating an EMA mismatch.

        ``TrainState.ema_params`` changes the pytree structure, so a
        checkpoint written with a different ``ema_decay`` setting than the
        current config would hard-fail a strict restore. Reconcile instead:

        - checkpoint HAS ema, target does not -> restore with an ema-shaped
          target, then drop the EMA copy (eval/sample/resume without
          ``--ema`` just uses the raw params);
        - checkpoint LACKS ema, target has it -> restore the ema-less
          state, then seed the EMA from the restored params (turning EMA on
          mid-run starts the average at the current weights).
        """
        self.wait()  # join any in-flight save of the same tag
        path = self._path(tag)
        ckpt_has_ema = self._saved_with_ema(path)
        if ckpt_has_ema and target.ema_params is None:
            shaped = target.replace(
                ema_params=jax.tree.map(jnp.copy, target.params)
            )
            restored = self._ckptr.restore(path, shaped)
            return restored.replace(ema_params=None)
        if not ckpt_has_ema and target.ema_params is not None:
            restored = self._ckptr.restore(path, target.replace(ema_params=None))
            return restored.replace(
                ema_params=jax.tree.map(jnp.copy, restored.params)
            )
        return self._ckptr.restore(path, target)

    def restore_weights(self, target: TrainState, tag: str = "best") -> TrainState:
        """Weights-centric restore for eval/sample/export: params, step and
        (when both sides carry it) ema_params. The optimizer state is
        deliberately NOT restored — its pytree structure legitimately
        varies with training flags (the grad_clip_norm optax.chain,
        grad_accum MultiSteps), and these consumers never touch it, so a
        full-structure `restore` would needlessly refuse a checkpoint
        trained under different optimizer settings. EMA reconciliation
        matches `restore`: a target that wants EMA but a checkpoint without
        one seeds the EMA from the restored params."""
        self.wait()
        path = self._path(tag)
        import orbax.checkpoint.args as ocp_args

        tpl = {"params": target.params, "step": target.step}
        want_ema = target.ema_params is not None
        if want_ema and self._saved_with_ema(path):
            tpl["ema_params"] = target.ema_params
        restorer = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        try:
            # restore ONTO the template leaves' shardings (mesh runs /
            # multi-process): without explicit restore_args orbax would lay
            # arrays out per the checkpoint metadata, not the target mesh
            out = restorer.restore(
                path, args=ocp_args.PyTreeRestore(
                    item=tpl,
                    restore_args=ocp.checkpoint_utils.construct_restore_args(
                        tpl),
                    partial_restore=True))
        finally:
            restorer.close()
        new = target.replace(params=out["params"], step=out["step"])
        if want_ema:
            new = new.replace(ema_params=out.get(
                "ema_params", jax.tree.map(jnp.copy, out["params"])))
        return new

    def _saved_with_ema(self, path: str) -> bool:
        """True iff the checkpoint at ``path`` carries an ema_params subtree
        (its metadata entry is None when the state was saved without EMA).

        Falls back to inspecting the on-disk layout when the Orbax metadata
        API shape changes, and warns — a silent False here would surface
        later as an opaque pytree-structure mismatch on restore.
        """
        tree = self._metadata_tree(path)
        if tree is not None:
            try:
                return tree.get("ema_params") is not None
            except (AttributeError, TypeError, KeyError):
                pass  # tree shape unexpected: use the on-disk probe
        # on-disk probe: the checkpoint's _METADATA json lists every tree
        # leaf; a no-EMA save has exactly one ('ema_params',) entry with
        # value_type "None", an EMA save has ('ema_params', 'params', ...)
        # array entries
        import json
        import warnings

        has_ema = False
        try:
            with open(os.path.join(path, "_METADATA")) as f:
                tree = json.load(f).get("tree_metadata", {})
            has_ema = any(
                key.startswith("('ema_params'")
                and (entry.get("value_metadata") or {}).get("value_type")
                != "None"
                for key, entry in tree.items()
            )
        except (OSError, json.JSONDecodeError):
            pass  # no _METADATA either: treat as no-EMA
        warnings.warn(
            "orbax metadata inspection failed; fell back to the on-disk "
            f"_METADATA probe for ema_params (found={has_ema})"
        )
        return has_ema

    def _metadata_tree(self, path: str):
        """Orbax leaf metadata at ``path`` unwrapped to a plain tree, or
        None when the metadata API is unavailable — the ONE place that
        knows the unwrap dance (``_saved_with_ema`` and ``metadata_tree``
        both build on it)."""
        try:
            meta = self._ckptr.metadata(path)
            tree = getattr(meta, "item_metadata", None) or meta
            return getattr(tree, "tree", tree)
        except (AttributeError, TypeError, KeyError, ValueError, OSError):
            return None

    def metadata_tree(self, tag: str = "latest"):
        """Leaf metadata (shape/dtype per saved array) of the checkpoint at
        ``tag`` as a plain tree, or None when the metadata API is
        unavailable. Used by ``parallel.spmd.elastic_restore_zero1`` to read
        the device count a ZeRO-1 state was saved under."""
        self.wait()
        return self._metadata_tree(self._path(tag))

    def saved_with_ema(self, tag: str = "latest") -> bool:
        """Public probe: does the checkpoint at ``tag`` carry an EMA copy?"""
        self.wait()
        return self._saved_with_ema(self._path(tag))

    def has(self, tag: str) -> bool:
        self.wait()
        return os.path.isdir(self._path(tag))

    def restore_latest(self, target: TrainState) -> Optional[TrainState]:
        """Auto-resume hook: returns the restored state or None.

        Falls back to 'best' when no 'latest' exists — the layout a
        ``cli convert`` leaves behind (a converted reference checkpoint at
        'best', step 0): training must warm-start from it, not reinitialise
        and clobber it at the first eval interval."""
        if self.has("latest"):
            return self.restore(target, "latest")
        if self.has("best"):
            print("[checkpoint] no 'latest' checkpoint; resuming from 'best'")
            return self.restore(target, "best")
        return None
