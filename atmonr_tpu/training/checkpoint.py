"""Checkpointing via Orbax (param/opt-state pytrees, per-epoch directories).

TPU-native replacement for the reference's ``torch.save`` per-epoch ``.pt``
files (``trainer.py:239-274``): Orbax writes sharded pytrees and supports
async multi-host checkpointing; layout is ``<output>/epoch_NNNN`` with
restore-latest by epoch number (same selection rule as reference
``trainer.py:265-266``).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"epoch_(\d+)$")


def save_checkpoint(
    output_path: str | Path, epoch: int, state: Any, extra: dict | None = None
) -> Path:
    """Save ``state`` (a pytree) under ``<output>/epoch_{epoch:04d}``."""
    ckptr = ocp.StandardCheckpointer()
    ckpt_dir = _start_save(ckptr, output_path, epoch, state, extra)
    ckptr.wait_until_finished()
    return ckpt_dir


def _start_save(
    ckptr: ocp.StandardCheckpointer,
    output_path: str | Path,
    epoch: int,
    state: Any,
    extra: dict | None,
) -> Path:
    output_path = Path(output_path).resolve()
    ckpt_dir = output_path / f"epoch_{epoch:04d}"
    ckptr.save(ckpt_dir, state, force=True)
    # the meta sidecar is tiny and host-local; process 0 writes it eagerly
    # (restore treats a missing sidecar as empty, so a crash between the
    # async array write and this point degrades gracefully)
    if extra is not None and jax.process_index() == 0:
        with open(output_path / f"epoch_{epoch:04d}.meta.json", "w") as f:
            json.dump(extra, f)
    return ckpt_dir


class AsyncCheckpointManager:
    """Overlapped per-epoch saves: ``StandardCheckpointer``'s save is
    already async (arrays are snapshotted to host then written by a
    background thread); the reference blocks training on ``torch.save``
    every epoch (reference trainer.py:214, :239-256). We only block if a
    previous save hasn't finished by the time the next one starts (and in
    ``close()`` before the process exits), so checkpoint I/O rides the
    training compute."""

    def __init__(self) -> None:
        self._ckptr = ocp.StandardCheckpointer()

    def save(
        self,
        output_path: str | Path,
        epoch: int,
        state: Any,
        extra: dict | None = None,
    ) -> Path:
        # implicit barrier with any in-flight save: Orbax serializes saves
        # on the same checkpointer and raises on overlapping writes, so
        # wait first (a no-op when the previous write already landed)
        self._ckptr.wait_until_finished()
        return _start_save(self._ckptr, output_path, epoch, state, extra)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.close()


def latest_epoch(output_path: str | Path) -> int | None:
    """Highest saved epoch number, or None."""
    output_path = Path(output_path)
    epochs = [
        int(m.group(1))
        for p in output_path.glob("epoch_*")
        if p.is_dir() and (m := _EPOCH_RE.search(p.name))
    ]
    return max(epochs) if epochs else None


def restore_checkpoint(
    output_path: str | Path, template: Any, epoch: int | None = None
) -> tuple[Any, int, dict]:
    """Restore the given (or latest) epoch into ``template``'s structure.

    Returns (state, epoch, extra_metadata).
    """
    output_path = Path(output_path).resolve()
    if epoch is None:
        epoch = latest_epoch(output_path)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {output_path}")
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(output_path / f"epoch_{epoch:04d}", template)
    meta_path = output_path / f"epoch_{epoch:04d}.meta.json"
    extra = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, epoch, extra


def restore_params(
    output_path: str | Path, params_template: Any, epoch: int | None = None
) -> Any:
    """Restore only the ``params`` subtree of a checkpoint (extraction and
    inference don't need the optimizer state)."""
    output_path = Path(output_path).resolve()
    if epoch is None:
        epoch = latest_epoch(output_path)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {output_path}")
    item = {"params": params_template}
    # explicit restore args re-place each leaf onto the template's sharding —
    # required when the checkpoint was written by a sharded (mesh) run and
    # extraction runs on a different device set
    restore_args = ocp.checkpoint_utils.construct_restore_args(item)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        out = ckptr.restore(
            output_path / f"epoch_{epoch:04d}",
            args=ocp.args.PyTreeRestore(
                item=item, restore_args=restore_args, partial_restore=True
            ),
        )
    return out["params"]
