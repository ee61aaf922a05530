"""Msgpack snapshot save/load — checkpoint/resume parity.

Rebuild of reference Testbed::save_snapshot / load_snapshot
(testbed.cu:127-163): the snapshot is the model-config document with a
"snapshot" subtree carrying {params (+ optional optimizer state), the EMA
density grid, scene scale/offset}. The occupancy bitfield is recomputed on
load, not stored (testbed.cu:160). We keep the same logical schema in
msgpack; ndarray leaves are encoded as {dtype, shape, raw bytes}.
"""

import msgpack
import numpy as np
import jax
import jax.numpy as jnp


def _encode_tree(tree):
    def enc(x):
        if isinstance(x, (jnp.ndarray, np.ndarray)):
            a = np.asarray(x)
            return {"__nd__": True, "dtype": str(a.dtype), "shape": list(a.shape), "data": a.tobytes()}
        return x

    return jax.tree_util.tree_map(enc, tree)


def _decode_tree(tree):
    def dec(x):
        if isinstance(x, dict) and x.get("__nd__"):
            return jnp.asarray(np.frombuffer(x["data"], dtype=x["dtype"]).reshape(x["shape"]))
        if isinstance(x, dict):
            return {k: dec(v) for k, v in x.items()}
        if isinstance(x, list):
            return [dec(v) for v in x]
        return x

    return dec(tree)


def save_snapshot(
    path,
    config_doc: dict,
    *,
    params,
    ema_params,
    density_grid,
    grid_step,
    i_step: int,
    scene_scale: float,
    scene_offset,
    opt_state=None,
):
    doc = dict(config_doc)
    snap = {
        "params": _encode_tree(params),
        "ema_params": _encode_tree(ema_params),
        "density_grid": _encode_tree(density_grid),
        "grid_step": int(grid_step),
        "i_step": int(i_step),
        "scene_scale": float(scene_scale),
        "scene_offset": [float(v) for v in scene_offset],
    }
    if opt_state is not None:
        flat, treedef = jax.tree_util.tree_flatten(opt_state)
        snap["opt_state_leaves"] = [_encode_tree(x) for x in flat]
    doc["snapshot"] = snap
    with open(path, "wb") as f:
        f.write(msgpack.packb(doc, use_bin_type=True))


def load_snapshot(path):
    """Returns (config_doc_without_snapshot, snapshot_dict with decoded arrays)."""
    with open(path, "rb") as f:
        doc = msgpack.unpackb(f.read(), raw=False, strict_map_key=False)
    snap_raw = doc.pop("snapshot", None)
    if snap_raw is None:
        raise ValueError(f"No 'snapshot' section in {path}")
    snap = {
        "params": _decode_tree(snap_raw["params"]),
        "ema_params": _decode_tree(snap_raw["ema_params"]),
        "density_grid": _decode_tree(snap_raw["density_grid"]),
        "grid_step": int(snap_raw.get("grid_step", 0)),
        "i_step": int(snap_raw.get("i_step", 0)),
        "scene_scale": float(snap_raw["scene_scale"]),
        "scene_offset": snap_raw["scene_offset"],
    }
    if "opt_state_leaves" in snap_raw:
        snap["opt_state_leaves"] = [_decode_tree(x) for x in snap_raw["opt_state_leaves"]]
    return doc, snap
