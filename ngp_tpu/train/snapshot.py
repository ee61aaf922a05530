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
    controller=None,
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
    if controller:
        # host controller state (n_rays/s_pad/s_short/per-ray estimate):
        # restoring it skips the warm-up transient on resume
        snap["controller"] = {k: v for k, v in controller.items()}
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
    if "controller" in snap_raw:
        snap["controller"] = dict(snap_raw["controller"])
    return doc, snap


# ---------------------------------------------------------------------------
# Reference (tcnn-style) snapshot interchange
# ---------------------------------------------------------------------------
#
# The reference snapshot is the model-config json serialized to msgpack with
# a "snapshot" subtree written by tcnn's Trainer::serialize plus the density
# grid and scene info (testbed.cu:127-163). The parameter vector is FLAT in
# the order density net -> rgb net -> pos encoding -> dir encoding
# (ngp_network.h:496-541), with tcnn's member layouts:
#  * FullyFusedMLP: per layer a ROW-major (n_out, n_in) matrix, input layer
#    first, output last; the rgb net's output matrix is padded to
#    padded_output_width=16 rows (ngp_network.h:547, alignment 16 for fused
#    nets h:732-743); no biases.
#  * HashGrid: levels concatenated at their 8-aligned sizes, entry-major
#    with the F features of an entry contiguous.
#  * SphericalHarmonics: no parameters.
# "params_binary" carries the raw bytes with "params_type" naming the
# element type; we export "float" (fp32, lossless from our masters) and
# import either "float" or "__half".
#
# NOTE: an imported tcnn checkpoint is only semantically meaningful with
# hash_variant="tcnn" (the table contents are a function of the hash); the
# loader reports this so the caller can pin the variant.


def _reference_mlp_slices(n_input, n_neurons, n_output_padded, n_hidden_layers):
    """tcnn fused-MLP layer shapes, row-major (out, in), input->output."""
    dims = [n_input] + [n_neurons] * n_hidden_layers + [n_output_padded]
    return [(dims[i + 1], dims[i]) for i in range(len(dims) - 1)]


def pack_reference_params(params, spec, net_cfg) -> np.ndarray:
    """Model params tree -> flat fp32 vector in the reference layout."""
    out = []
    # density net: ours (in, out) column layouts -> tcnn (out, in) row-major
    for w in params["density_mlp"]:
        out.append(np.asarray(w, np.float32).T.reshape(-1))
    # rgb net: pad the output layer's 3 columns to 16 (padded_output_width)
    rgb = [np.asarray(w, np.float32) for w in params["rgb_mlp"]]
    last = np.zeros((rgb[-1].shape[0], 16), np.float32)
    last[:, : rgb[-1].shape[1]] = rgb[-1]
    for w in rgb[:-1]:
        out.append(w.T.reshape(-1))
    out.append(last.T.reshape(-1))
    # pos encoding: levels at their aligned sizes, entry-major, F-fast
    from ngp_tpu.ops.hash_encoding import as_level_major

    tbl = np.asarray(as_level_major(params["hash_table"], spec), np.float32)
    for l in range(spec.n_levels):
        out.append(tbl[l, : spec.sizes[l], :].reshape(-1))
    return np.concatenate(out)


def unpack_reference_params(flat, spec, net_cfg):
    """Flat reference-layout fp32 vector -> model params tree."""
    flat = np.asarray(flat, np.float32)
    pos = 0

    def take(shape):
        nonlocal pos
        n = int(np.prod(shape))
        a = flat[pos : pos + n].reshape(shape)
        pos += n
        return a

    sh_dims = net_cfg.sh_degree**2
    density_out = net_cfg.density_n_output_dims
    density = []
    for shp in _reference_mlp_slices(
        spec.n_output_dims, net_cfg.density_mlp.n_neurons, density_out, net_cfg.density_mlp.n_hidden_layers
    ):
        density.append(jnp.asarray(take(shp).T))
    rgb = []
    shapes = _reference_mlp_slices(
        density_out + sh_dims, net_cfg.rgb_mlp.n_neurons, 16, net_cfg.rgb_mlp.n_hidden_layers
    )
    for i, shp in enumerate(shapes):
        w = take(shp).T
        if i == len(shapes) - 1:
            w = w[:, :3]  # strip the output padding
        rgb.append(jnp.asarray(w))
    tbl = np.zeros((spec.n_levels, spec.padded_size, spec.n_features), np.float32)
    for l in range(spec.n_levels):
        tbl[l, : spec.sizes[l], :] = take((spec.sizes[l], spec.n_features))
    if pos != flat.size:
        raise ValueError(f"reference param vector has {flat.size} elements, consumed {pos}")
    # store in the optimizer layout (L, F, T) — see hash_table_init
    return {"hash_table": jnp.asarray(tbl.transpose(0, 2, 1)), "density_mlp": density, "rgb_mlp": rgb}


def save_reference_snapshot(
    path, config_doc: dict, *, params, spec, net_cfg, density_grid, scene_scale, scene_offset, sampler_cfg
):
    """Write a tcnn-layout snapshot (testbed.cu:127-141 schema).

    The density grid is reordered linear->Morton per cascade: the reference
    indexes its grid by tcnn::morton3D (occupancy_sampler.cu:33-35, 97-99)
    and serializes it verbatim (testbed.cu:132-136)."""
    variant = getattr(spec, "variant", "tcnn")
    if variant != "tcnn":
        # table contents are a function of the hash: exporting an oadd/xadd
        # table in the reference layout would load fine but render garbage
        raise ValueError(
            f"reference-snapshot export requires hash variant 'tcnn', got {variant!r}; "
            "train with encoding otype variant 'tcnn' to produce interchangeable checkpoints"
        )
    from ngp_tpu.utils.morton import density_grid_to_reference

    flat = pack_reference_params(params, spec, net_cfg)
    grid_morton = density_grid_to_reference(density_grid, sampler_cfg.grid_size, sampler_cfg.n_cascades)
    doc = dict(config_doc)
    doc["snapshot"] = {
        "n_params": int(flat.size),
        "params_type": "float",
        "params_binary": flat.tobytes(),
        "density_grid": [float(v) for v in grid_morton],
        "scene_scale": float(scene_scale),
        "scene_offset": [float(v) for v in scene_offset],
    }
    with open(path, "wb") as f:
        f.write(msgpack.packb(doc, use_bin_type=True))


def load_reference_snapshot_dict(doc, spec, net_cfg, sampler_cfg):
    """Reference-style snapshot dict -> (params, density_grid, scale, offset).

    Accepts params_type "float" or "__half". The density grid arrives in the
    reference's Morton order (occupancy_sampler.cu:33-35) and is reordered to
    our linear x-fastest layout."""
    from ngp_tpu.utils.morton import density_grid_from_reference

    snap = doc["snapshot"]
    ptype = snap.get("params_type", "__half")
    raw = snap["params_binary"]
    if isinstance(raw, (bytes, bytearray)):
        buf = bytes(raw)
    else:  # nlohmann binary may decode as a list of ints
        buf = bytes(raw)
    dtype = np.float32 if ptype == "float" else np.float16
    flat = np.frombuffer(buf, dtype=dtype).astype(np.float32)
    if "n_params" in snap and int(snap["n_params"]) != flat.size:
        raise ValueError(f"n_params {snap['n_params']} != binary size {flat.size}")
    params = unpack_reference_params(flat, spec, net_cfg)
    grid = jnp.asarray(
        density_grid_from_reference(snap["density_grid"], sampler_cfg.grid_size, sampler_cfg.n_cascades)
    )
    return params, grid, float(snap.get("scene_scale", 0.33)), list(snap.get("scene_offset", [0.5, 0.5, 0.5]))


def is_reference_snapshot(doc) -> bool:
    snap = doc.get("snapshot")
    return isinstance(snap, dict) and "params_binary" in snap
