"""Checkpoint save/load with mid-training resume.

The reference saves ``{timestamp, epoch, model_state_dict,
optimizer_state_dict, precision, recall, hyperparams}`` via ``torch.save``
(``src/utils_v2.py:214-232``) but never restores the optimizer state —
mid-training resume does not exist there (SURVEY.md §5). This framework
persists the same logical payload as an ``.npz`` of pytree leaves plus a JSON
manifest, and restores BOTH params and optimizer state so training resumes
exactly (a designed-in capability, not reference parity).

Layout per checkpoint directory:
    <dir>/checkpoint.npz   leaf_0..leaf_N of tree_flatten((params, opt_state))
    <dir>/meta.json        epoch/step, metrics, hyperparams, timestamp
"""
from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime

import jax
import numpy as np

BEST_NAME = "LightGCN_best"  # reference file-name parity (train_lightgcn.py:114)
LAST_NAME = "LightGCN_last"


def save_checkpoint(
    directory: str,
    params,
    opt_state,
    *,
    epoch: int,
    precision: float,
    recall: float,
    hyperparams: dict | None = None,
    name: str = BEST_NAME,
) -> str:
    path = os.path.join(directory, name)
    # Multi-host discipline: every process participates in gathering the
    # leaves to host-addressable replicas (parallel.distributed.replicate_tree,
    # applied by the driver's checkpoint view BEFORE this call), but only
    # process 0 touches the filesystem — N processes writing the same files
    # would tear the npz/meta pair. The reference is single-process
    # (src/train_lightgcn.py:13); this is new multi-host scope.
    if jax.process_count() > 1 and jax.process_index() != 0:
        return path
    os.makedirs(path, exist_ok=True)
    with_paths, _ = jax.tree_util.tree_flatten_with_path((params, opt_state))
    leaves = [leaf for _, leaf in with_paths]
    # Atomic: write tmp + rename, npz BEFORE meta — meta.json's existence
    # (the resume/serve discovery check) then implies a complete npz even if
    # the process dies mid-write (async saves widen that window). The PAIR is
    # not atomic (two os.replace calls), so meta carries the npz sha256:
    # a crash between the replaces leaves new weights under stale meta, and
    # load_checkpoint turns that into a loud error instead of resuming with
    # the wrong epoch/recall attribution.
    npz_path = os.path.join(path, "checkpoint.npz")
    np.savez(
        npz_path + ".tmp.npz",
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    npz_sha = _file_sha256(npz_path + ".tmp.npz")
    os.replace(npz_path + ".tmp.npz", npz_path)
    meta = {
        "npz_sha256": npz_sha,
        "timestamp": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        "epoch": int(epoch),
        "precision": float(precision),
        "recall": float(recall),
        "hyperparams": hyperparams or {},
        "num_leaves": len(leaves),
        # Keyed manifest: pytree key path per leaf ("[0]" = params,
        # "[1]" = opt_state), so consumers locate leaves by NAME instead of
        # position (serve reads the embedding this way).
        "leaf_paths": [jax.tree_util.keystr(kp) for kp, _ in with_paths],
    }
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(meta_path + ".tmp", meta_path)
    return path


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 22), b""):
            h.update(block)
    return h.hexdigest()


def load_checkpoint(directory: str, name: str = BEST_NAME) -> tuple[list, dict]:
    """Load raw leaves + metadata; combine with ``restore_into``.

    Validates meta's recorded npz sha256 (when present — older checkpoints
    predate it) so a save interrupted between the npz and meta renames fails
    loudly here instead of silently resuming under the wrong metadata.
    The hash is computed over the EXACT bytes that are then loaded (one
    read into memory) — hashing the file and then re-opening it would let a
    concurrent save swap the npz in between, reattributing new weights to
    stale metadata. A mismatch is retried: a CONCURRENT save (serving
    refresh while training writes every epoch) can legally replace the npz
    while this reader holds the old meta — re-reading lands on a consistent
    pair; only a persistent mismatch (a genuinely torn pair on disk)
    raises."""
    import io

    path = os.path.join(directory, name)
    npz_path = os.path.join(path, "checkpoint.npz")
    have = want = blob = None
    for _ in range(3):
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        want = meta.get("npz_sha256")
        with open(npz_path, "rb") as f:
            blob = f.read()
        if want is None:
            break
        have = hashlib.sha256(blob).hexdigest()
        if have == want:
            break
    else:
        raise RuntimeError(
            f"checkpoint {path}: npz sha256 {have[:12]}… does not match "
            f"meta.json ({want[:12]}…) after retries — the save was "
            "interrupted between the weights and metadata writes; delete "
            "this checkpoint dir or restore the matching pair"
        )
    data = np.load(io.BytesIO(blob))
    leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    return leaves, meta


def find_leaf(leaves: list, meta: dict, needle: str, prefix: str = "[0]"):
    """Locate a leaf by key-path substring via the keyed manifest
    (``meta['leaf_paths']``); ``prefix`` narrows to params (``"[0]"``) or
    opt_state (``"[1]"``). Falls back to ``leaves[0]`` for pre-manifest
    checkpoints (their layout was params-embedding-first)."""
    paths = meta.get("leaf_paths")
    if paths:
        for p, leaf in zip(paths, leaves):
            if p.startswith(prefix) and needle in p:
                return leaf
        raise KeyError(f"no checkpoint leaf matching {prefix}*{needle}: {paths}")
    return leaves[0]


def restore_into(params_like, opt_state_like, leaves: list):
    """Rebuild (params, opt_state) from loaded leaves using template pytrees
    (fresh ``init_params`` / ``optimizer.init`` outputs define the treedef)."""
    treedef = jax.tree_util.tree_structure((params_like, opt_state_like))
    template_leaves = jax.tree_util.tree_leaves((params_like, opt_state_like))
    assert len(template_leaves) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, template has {len(template_leaves)}"
    )
    import jax.numpy as jnp

    new_leaves = [
        jnp.asarray(leaf, dtype=t.dtype) for leaf, t in zip(leaves, template_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
