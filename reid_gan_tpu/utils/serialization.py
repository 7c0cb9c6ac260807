"""Checkpoint save/load for functional train states.

Parity targets:
- reid: ``save_checkpoint(state, is_best, fpath)`` writing ``checkpoint.pth.tar``
  + best copy (CC/clustercontrast/utils/serialization.py:24-28) — here we write
  msgpack pytrees (``checkpoint.msgpack``) instead of torch pickles.
- GAN: per-net files ``{which_epoch}_net_{name}`` with tolerant loading
  (CC/dual_gan/models/base_model.py:94-161).

We use flax's msgpack serialization for single-file pytree checkpoints (small
models, ~25-60M params, so single-file is fine) and keep the per-net layout for
GAN nets. Orbax is available for async/sharded checkpoints of larger states.
"""

import os
import shutil

import jax
import numpy as np
from flax import serialization as flax_ser
from flax.core import frozen_dict

from .osutils import mkdir_if_missing


def _to_host(tree):
    """Device → host numpy, preserving pytree structure."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state, is_best=False, fpath="checkpoint.msgpack"):
    """Serialize a pytree ``state`` to ``fpath``; copy to ``model_best.msgpack``
    when ``is_best`` (CC/clustercontrast/utils/serialization.py:24-28)."""
    mkdir_if_missing(os.path.dirname(fpath) or ".")
    data = flax_ser.msgpack_serialize(_to_host(state))
    tmp = fpath + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, fpath)
    if is_best:
        shutil.copy(fpath, os.path.join(os.path.dirname(fpath), "model_best.msgpack"))


def load_checkpoint(fpath, target=None):
    """Load a msgpack checkpoint. With ``target`` pytree given, restores into
    its structure (shape-checked); otherwise returns raw nested dicts.

    Parity: CC/clustercontrast/utils/serialization.py:41-49."""
    if not os.path.isfile(fpath):
        raise ValueError(f"=> No checkpoint found at '{fpath}'")
    with open(fpath, "rb") as f:
        data = f.read()
    if target is not None:
        out = flax_ser.msgpack_restore(data)
        out = flax_ser.from_state_dict(target, out)
        print(f"=> Loaded checkpoint '{fpath}'")
        return out
    out = flax_ser.msgpack_restore(data)
    print(f"=> Loaded checkpoint '{fpath}'")
    return out


def copy_state_dict(state_dict, target, strip=None):
    """Copy leaves from a (possibly prefixed) flat state dict into ``target``.

    Tolerates missing keys and extra keys — parity with
    CC/clustercontrast/utils/serialization.py:51-61 and the robust per-net GAN
    loader CC/dual_gan/models/base_model.py:106-161.

    ``state_dict`` is a nested dict; ``target`` a pytree/nested dict. Keys in
    ``state_dict`` beginning with ``strip`` have that prefix removed.
    """
    flat_src = _flatten(state_dict)
    if strip:
        flat_src = {
            (k[len(strip):] if k.startswith(strip) else k): v
            for k, v in flat_src.items()
        }
    tgt_plain = frozen_dict.unfreeze(target) if hasattr(target, "unfreeze") else target
    flat_tgt = _flatten(tgt_plain)
    copied, skipped = 0, []
    for k, v in flat_src.items():
        if k in flat_tgt and tuple(np.shape(v)) == tuple(np.shape(flat_tgt[k])):
            flat_tgt[k] = np.asarray(v)
            copied += 1
        else:
            skipped.append(k)
    if skipped:
        print(f"copy_state_dict: skipped {len(skipped)} keys (missing/shape-mismatch)")
    print(f"copy_state_dict: copied {copied} tensors")
    return _unflatten(flat_tgt)


def save_networks(nets, save_dir, which_epoch):
    """Per-net checkpoint layout ``{epoch}_net_{name}.msgpack``
    (parity: CC/dual_gan/models/base_model.py:94-103,
    FD/fdgan/model.py:250-259)."""
    mkdir_if_missing(save_dir)
    for name, net_state in nets.items():
        save_checkpoint(net_state, fpath=os.path.join(save_dir, f"{which_epoch}_net_{name}.msgpack"))


def load_networks(nets, save_dir, which_epoch):
    """Tolerant per-net loading: missing files are skipped with a warning
    (parity: CC/dual_gan/models/base_model.py:106-161)."""
    out = {}
    for name, net_state in nets.items():
        fpath = os.path.join(save_dir, f"{which_epoch}_net_{name}.msgpack")
        if not os.path.isfile(fpath):
            print(f"load_networks: no checkpoint for net '{name}' at {fpath}; keeping init")
            out[name] = net_state
            continue
        out[name] = load_checkpoint(fpath, target=net_state)
    return out


def _flatten(d, prefix=""):
    flat = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = v
    return flat


def _unflatten(flat):
    out = {}
    for k, v in flat.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out
