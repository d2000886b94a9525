"""Crash-safe directory swap for foreachBatch-maintained stores.

The stores in :mod:`sketches` / :mod:`upsert` publish each merged
micro-batch by renaming a freshly-written sibling over the live
directory. A plain two-rename swap (store→.old, .swap→store) has a
crash window between the renames: on replay ``os.path.isdir(store)``
is False, so the merge would silently REBUILD from the replayed batch
alone — losing all previously-absorbed state and breaking the
documented crash-replay guarantees. These helpers close the window:

- :func:`recover_store` runs before any merge reads the store. If the
  store is missing but its ``.old`` sibling exists, the crash happened
  mid-swap — rename ``.old`` back so the replayed batch merges against
  the full pre-crash state (the half-written ``.swap`` is discarded and
  rebuilt by the merge itself).
- :func:`swap_store` performs the publish. It first clears any STALE
  ``.old`` left by a crash that happened after the swap completed but
  before cleanup (store present ⇒ ``.old`` is garbage), so the
  subsequent ``store→.old`` rename cannot fail on a leftover dir.

With both in place every crash point resolves to one of two states on
replay: (a) pre-swap store intact (possibly via recovery) → the batch
re-merges, which each store's merge rule tolerates (HLL max-merge is
idempotent; CMS/upsert gate on a marker / LWW total order); or
(b) post-swap store intact → marker/idempotence makes the re-merge a
no-op. No state is ever dropped.
"""

from __future__ import annotations

import os
import shutil


def _old_dir(store_dir: str) -> str:
    return store_dir.rstrip("/") + ".old"


def recover_store(store_dir: str) -> None:
    """Restore a store that a mid-swap crash left renamed aside."""
    old = _old_dir(store_dir)
    if not os.path.isdir(store_dir) and os.path.isdir(old):
        os.rename(old, store_dir)


def swap_store(store_dir: str, tmp_dir: str) -> None:
    """Atomically-enough publish ``tmp_dir`` as the new ``store_dir``.

    Single-filesystem renames are atomic; the only non-atomic window
    (between aside-rename and publish-rename) is covered by
    :func:`recover_store` on the next merge.
    """
    # Idempotent self-protection: if a mid-swap crash left the store
    # renamed aside (store missing, .old present), the rmtree below
    # would otherwise delete the sole surviving pre-crash state when
    # this helper is invoked standalone (current callers all run
    # recover_store first, but the helper must be safe on its own).
    recover_store(store_dir)
    old = _old_dir(store_dir)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(store_dir):
        os.rename(store_dir, old)
    os.rename(tmp_dir, store_dir)
    shutil.rmtree(old, ignore_errors=True)
