"""Shared-storage contract for worker-written artifacts (round-3 VERDICT
#4).

Several pipelines write artifacts from WORKER tasks — the fused web-pass's
per-doc stats Parquet (``pipelines.flagship``), the persisted IVF index
(``sim.ivf``), the clean-corpus output + duplicate-id index
(``pipelines.clean_corpus``), and checkpoints (``ray_glue.checkpoint``).
On a real multi-node cluster every such directory MUST live on storage
visible to the driver AND every worker (NFS mount, fuse-mounted object
store, etc.) — a node-local path like ``/tmp`` silently fragments the
artifact across machines, each worker writing its own private copy.

One knob controls the default root:

- ``HK_STORAGE_ROOT`` env var, else ``/tmp/hksketch_artifacts`` — the
  latter is a SINGLE-NODE default, correct only when driver and workers
  share one machine (this sandbox; CI).  Cluster deployments must set
  ``HK_STORAGE_ROOT`` to a shared URI/mount.

Callers can always pass explicit directories; ``artifact_dir`` is the
default-resolution helper they share.
"""

from __future__ import annotations

import os

_SINGLE_NODE_DEFAULT = "/tmp/hksketch_artifacts"


def storage_root(root: str | None = None) -> str:
    """The artifact storage root: explicit ``root`` > ``HK_STORAGE_ROOT``
    env > single-node ``/tmp`` default (see module docstring for the
    multi-node requirement)."""
    return root or os.environ.get("HK_STORAGE_ROOT") or _SINGLE_NODE_DEFAULT


def artifact_dir(*parts: str, root: str | None = None) -> str:
    """Join ``parts`` under the storage root (no mkdir — writers own
    creation semantics, e.g. tmp+rename publication)."""
    return os.path.join(storage_root(root), *parts)
