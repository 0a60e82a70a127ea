"""Checkpoint I/O.

Capability parity with reference src/utils/net_utils.py:288-457:

* checkpoint payload = ``{net, optim, scheduler, recorder, epoch}``
  (net_utils.py:325-331)
* directory layout ``<trained_model_dir>/{N.ckpt, latest.ckpt}``;
  retention keeps the 5 most recent numbered files plus latest
  (net_utils.py:337-343)
* ``resume=False`` wipes the model dir (net_utils.py:289-290)
* ``load_network`` = weights-only load for eval (net_utils.py:346-379)
  with prefix surgery (strip/add a key prefix, net_utils.py:382-415)
* ``save_pretrain``/``load_pretrain`` warm starts under
  ``data/trained_model/pretrain/<task>`` (net_utils.py:429-457)
* ``save_trained_config`` snapshots argv + merged YAML
  (net_utils.py:418-426)

Arrays are host-fetched numpy trees serialized with pickle; restoring
into jitted state works because optax/flax states are pure pytrees.
"""

from __future__ import annotations

import os
import pickle
import shutil
import sys

import jax
import numpy as np

# bump when the payload schema changes; loaders accept <= CKPT_VERSION
# (version 0 = round-1 checkpoints without the tag)
CKPT_VERSION = 1


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def check_params_compat(loaded, expected):
    """Raise a descriptive error when a loaded checkpoint's leaf shapes
    do not match the constructed network's.

    The classic trap: hash-grid backends have different table shapes
    (brick: (n_rows, 256); xla: (table_size, n_features)), so loading a
    checkpoint trained with the other backend — or another
    ``log2_bricks`` — fails deep inside jit with an opaque shape error.
    Name the knob instead.
    """
    def walk(lo, ex, path):
        if isinstance(ex, dict) and isinstance(lo, dict):
            for k in ex:
                if k in lo:
                    walk(lo[k], ex[k], path + (k,))
            return
        ls = getattr(lo, "shape", None)
        es = getattr(ex, "shape", None)
        if ls is not None and es is not None and tuple(ls) != tuple(es):
            where = "/".join(path)
            hint = ""
            if path and path[-1] == "table":
                hint = (" — hash-grid table shape mismatch: the "
                        "checkpoint was trained with a different "
                        "network.xyz_encoder backend ('brick' vs 'xla') "
                        "or log2_bricks/log2_hashmap_size than this "
                        "config selects")
            raise ValueError(
                f"checkpoint incompatible with network: param '{where}' "
                f"has shape {tuple(ls)} but the network expects "
                f"{tuple(es)}{hint}")

    walk(loaded, expected, ())


def save_model(net_params, opt_state, scheduler_state, recorder_state,
               epoch: int, model_dir: str, latest: bool = False,
               keep: int = 5):
    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "version": CKPT_VERSION,
        "net": _to_host(net_params),
        "optim": _to_host(opt_state),
        "scheduler": scheduler_state,
        "recorder": recorder_state,
        "epoch": int(epoch),
    }
    name = "latest.ckpt" if latest else f"{epoch}.ckpt"
    tmp = os.path.join(model_dir, name + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, os.path.join(model_dir, name))

    # retention: keep the `keep` newest numbered checkpoints (reference
    # net_utils.py:337-343)
    numbered = sorted(
        int(p.split(".")[0]) for p in os.listdir(model_dir)
        if p.endswith(".ckpt") and p.split(".")[0].isdigit())
    for e in numbered[:-keep]:
        os.remove(os.path.join(model_dir, f"{e}.ckpt"))


def _pick_checkpoint(model_dir: str, epoch: int = -1) -> str | None:
    if not os.path.isdir(model_dir):
        return None
    names = [p for p in os.listdir(model_dir) if p.endswith(".ckpt")]
    if not names:
        return None
    if epoch != -1:
        path = os.path.join(model_dir, f"{epoch}.ckpt")
        return path if os.path.exists(path) else None
    if "latest.ckpt" in names:
        return os.path.join(model_dir, "latest.ckpt")
    numbered = sorted(
        int(p.split(".")[0]) for p in names if p.split(".")[0].isdigit())
    return os.path.join(model_dir, f"{numbered[-1]}.ckpt") if numbered else None


def _candidate_checkpoints(model_dir: str, epoch: int = -1) -> list[str]:
    """Preferred checkpoint first, then numbered epochs newest-first as
    corruption fallbacks (a torn write to latest.ckpt must not lose the
    run — atomic rename protects one file, not a half-written disk)."""
    first = _pick_checkpoint(model_dir, epoch)
    if first is None:
        return []
    candidates = [first]
    if epoch == -1 and os.path.isdir(model_dir):
        numbered = sorted(
            (int(p.split(".")[0]) for p in os.listdir(model_dir)
             if p.endswith(".ckpt") and p.split(".")[0].isdigit()),
            reverse=True)
        for e in numbered:
            path = os.path.join(model_dir, f"{e}.ckpt")
            if path != first:
                candidates.append(path)
    return candidates


def _load_payload(path: str) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if not isinstance(payload, dict) or "net" not in payload:
        raise ValueError(f"malformed checkpoint payload: {path}")
    version = int(payload.get("version", 0))
    if version > CKPT_VERSION:
        raise ValueError(
            f"checkpoint {path} has version {version} > supported "
            f"{CKPT_VERSION}")
    return payload


def _load_first_valid(model_dir: str, epoch: int = -1):
    for path in _candidate_checkpoints(model_dir, epoch):
        try:
            payload = _load_payload(path)
        except Exception as e:  # corrupt/truncated/foreign -> next newest
            print(f"checkpoint {path} unreadable ({e}); trying previous",
                  file=sys.stderr)
            continue
        return path, payload
    return None, None


def load_model(model_dir: str, resume: bool = True, epoch: int = -1):
    """Returns the checkpoint payload dict, or None (fresh start).
    resume=False wipes the directory (reference net_utils.py:289-290).
    A corrupt latest.ckpt falls back to the newest readable numbered
    checkpoint."""
    if not resume:
        if os.path.exists(model_dir):
            print(f"remove contents of directory {model_dir}")
            shutil.rmtree(model_dir, ignore_errors=True)
        return None
    path, payload = _load_first_valid(model_dir, epoch)
    if payload is None:
        return None
    print(f"load model: {path}")
    return payload


def _strip_prefix(tree: dict, prefix: str) -> dict:
    if not prefix:
        return tree
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in tree.items()
    }


def _add_prefix(tree: dict, prefix: str) -> dict:
    if not prefix:
        return tree
    return {prefix + k: v for k, v in tree.items()}


def load_network(model_dir: str, resume: bool = True, epoch: int = -1,
                 strict: bool = True, remove_prefix: str = "",
                 add_prefix: str = ""):
    """Weights-only load (reference net_utils.py:346-379 + prefix surgery
    382-415). Returns the params pytree or None."""
    if not resume:
        return None
    path, payload = _load_first_valid(model_dir, epoch)
    if payload is None:
        if strict:
            raise FileNotFoundError(f"no readable checkpoint under {model_dir}")
        return None
    print(f"load network: {path}")
    net = payload["net"]
    if remove_prefix or add_prefix:
        if "params" in net and isinstance(net["params"], dict):
            net = dict(net)
            net["params"] = _add_prefix(
                _strip_prefix(net["params"], remove_prefix), add_prefix)
    return net


def pretrain_dir(task: str, base: str = "data/trained_model") -> str:
    return os.path.join(base, "pretrain", task)


def save_pretrain(net_params, task: str, model_dir: str | None = None):
    d = model_dir or pretrain_dir(task)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "pretrain.ckpt"), "wb") as f:
        pickle.dump({"net": _to_host(net_params)}, f)


def load_pretrain(task_or_dir: str):
    d = (task_or_dir if os.path.isdir(task_or_dir)
         else pretrain_dir(task_or_dir))
    path = os.path.join(d, "pretrain.ckpt")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        # stderr: bench.py's stdout must stay a single JSON line
        print(f"load pretrain: {path}", file=sys.stderr)
        return pickle.load(f)["net"]


def save_trained_config(cfg):
    """Snapshot cmdline + merged YAML (reference net_utils.py:418-426)."""
    d = cfg.trained_config_dir
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n")
    with open(os.path.join(d, "config.yaml"), "w") as f:
        f.write(cfg.dump())
