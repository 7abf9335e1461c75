"""Checkpointing for model pytrees.

The reference persists only the PINc weights via ``torch.save`` and skips
training when the file exists
(``train_tank_brov2_full_comparison.py:944-969``).  Here any model pytree
(PINc params, Koopman A/B/centers, DI gains — fitting is deterministic but
worth caching, SURVEY.md §5) round-trips through flax's msgpack
serialization; an orbax-based variant is provided for sharded/async use.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
from flax import serialization


def save_pytree(path, pytree) -> None:
    """Serialize a pytree of arrays to ``path`` (msgpack)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = jax.tree.map(lambda a: jax.device_get(a), pytree)
    path.write_bytes(serialization.to_bytes(host))


def load_pytree(path, like):
    """Load a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (and dtypes) to restore into."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(like, data)


def save_orbax(path, pytree) -> None:
    """Orbax checkpoint (directory format; supports sharded arrays)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.fspath(path), pytree, force=True)


def load_orbax(path, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if like is None:
        return ckptr.restore(os.fspath(Path(path).absolute()))
    return ckptr.restore(os.fspath(Path(path).absolute()), item=like)
