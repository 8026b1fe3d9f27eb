"""Checkpoint save/resume + torch-checkpoint import.

Parity targets:
- single-file training checkpoint with epoch / train hours / best metric /
  lr / model / ema / optimizer / scheduler state
  (/root/reference/tools/train_classification_model.py:229-262);
- ``best.pth`` equivalent holding the bare model params renamed at the end;
- shape- and name-filtered partial loading with bicubic resize of ViT
  position embeddings for new input sizes
  (/root/reference/SimpleAICV/classification/common.py:758-841).

Storage format: Orbax (async-capable, sharded-array aware). Torch ``.pth``
import uses torch CPU only (baked into the image) and converts tensors to
numpy before mapping into the JAX param tree.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointStore:
    """Orbax-backed store mirroring latest.pth / best.pth semantics."""

    def __init__(self, checkpoint_dir: str):
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.checkpoint_dir, name)

    _sync_counter = 0

    def _clear(self, path: str):
        """Overwrite semantics (latest.pth behavior) — orbax refuses to
        overwrite. Multi-process: orbax saves are collective (every
        process must call save; the primary host does the writes), so
        only process 0 clears, behind a barrier so no process can enter
        the new save while the old directory is mid-delete."""
        import shutil
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            if jax.process_index() == 0 and os.path.exists(path):
                shutil.rmtree(path)
            CheckpointStore._sync_counter += 1
            multihost_utils.sync_global_devices(
                f"ckpt_clear_{CheckpointStore._sync_counter}")
        elif os.path.exists(path):
            shutil.rmtree(path)

    def save_latest(self, state_tree: dict):
        """state_tree: pure pytree of arrays + python scalars (epoch etc.).
        Collective under multi-process (call from EVERY process)."""
        path = self._path("latest")
        self._clear(path)
        self._ckptr.save(path, state_tree)
        self._ckptr.wait_until_finished()

    def save_best(self, params):
        path = self._path("best")
        self._clear(path)
        self._ckptr.save(path, params)
        self._ckptr.wait_until_finished()

    def has_latest(self) -> bool:
        return os.path.exists(self._path("latest"))

    def restore_latest(self, abstract_tree):
        return self._ckptr.restore(self._path("latest"), abstract_tree)

    def restore_best(self, abstract_params):
        return self._ckptr.restore(self._path("best"), abstract_params)


def _resize_position_embedding(src: np.ndarray,
                               dst_shape: tuple) -> np.ndarray:
    """Bicubic 2-D resize of a ViT pos-embed [1, N(+1), C] -> dst token count.

    Mirrors the reference's interpolation-on-grid
    (classification/common.py:790-835) using jax.image.resize (cubic).
    """
    # cls detection: token count not a perfect square -> leading cls token
    n_src = src.shape[1]
    cls_tok = None
    side = int(round(n_src**0.5))
    if side * side != n_src:
        cls_tok, src = src[:, :1], src[:, 1:]
        n_src -= 1
        side = int(round(n_src**0.5))
    n_dst = dst_shape[1]
    dst_side = int(round(n_dst**0.5))
    if cls_tok is not None or dst_side * dst_side != n_dst:
        if dst_side * dst_side != n_dst:
            dst_side = int(round((n_dst - 1)**0.5))
            take_cls = True
        else:
            take_cls = False
    else:
        take_cls = False
    grid = src.reshape(1, side, side, src.shape[-1])
    resized = jax.image.resize(grid,
                               (1, dst_side, dst_side, src.shape[-1]),
                               method="cubic")
    out = np.asarray(resized).reshape(1, dst_side * dst_side, src.shape[-1])
    if take_cls and cls_tok is not None:
        out = np.concatenate([cls_tok, out], axis=1)
    return out.astype(src.dtype)


def load_params_filtered(saved_flat: dict, params,
                         logger=None) -> "tuple":
    """Name- and shape-filtered merge of a flat {dotted_name: ndarray} dict
    into a param pytree, with pos-embed resize on token-count mismatch.

    Returns (merged_params, num_loaded, num_total).
    """
    from .optimizers import leaf_path_names
    names = leaf_path_names(params)
    leaves = jax.tree_util.tree_leaves(params)
    treedef = jax.tree_util.tree_structure(params)

    new_leaves = []
    loaded = 0
    for name, leaf in zip(names, leaves):
        if name in saved_flat:
            src = np.asarray(saved_flat[name])
            if src.shape == leaf.shape:
                new_leaves.append(jnp.asarray(src, leaf.dtype))
                loaded += 1
                continue
            if ("position_encoding" in name or "pos_embed" in name) and \
                    src.ndim == 3 and leaf.ndim == 3 and \
                    src.shape[-1] == leaf.shape[-1]:
                resized = _resize_position_embedding(src, leaf.shape)
                if resized.shape == tuple(leaf.shape):
                    new_leaves.append(jnp.asarray(resized, leaf.dtype))
                    loaded += 1
                    if logger:
                        logger.info(
                            f"resized position embedding {name}: "
                            f"{src.shape} -> {leaf.shape}")
                    continue
            if logger:
                logger.info(f"skip {name}: shape {src.shape} != {leaf.shape}")
        new_leaves.append(leaf)
    merged = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return merged, loaded, len(leaves)


def flatten_params(params) -> dict:
    """Param pytree -> flat {dotted_name: np.ndarray} dict."""
    from .optimizers import leaf_path_names
    names = leaf_path_names(params)
    leaves = jax.tree_util.tree_leaves(params)
    return {n: np.asarray(l) for n, l in zip(names, leaves)}


def load_torch_state_dict(path: str) -> Optional[dict]:
    """Load a torch .pth state dict to {name: np.ndarray} (CPU torch)."""
    if not path or not os.path.exists(path):
        return None
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
