"""Reference-snapshot interchange against a HAND-BUILT fixture in the
reference's true byte/order layout — not a self-roundtrip.

The reference's density grid is Morton-indexed per cascade
(occupancy_sampler.cu:33-35, 97-99, 200-204) and serialized verbatim
(testbed.cu:132-136); params_binary in a real tcnn snapshot is __half.
These tests build that layout by hand (with an independent loop-based
Morton encoder) so symmetric export/import bugs cannot hide.
"""

import msgpack
import numpy as np

from ngp_tpu.data.synthetic import write_synthetic_dataset
from ngp_tpu.testbed import Testbed

CFG = {
    "samlper": {"aabb_scale": 1, "grid_size": 16, "maximum_marching_steps": 128},
    "network": {
        "encoding": {
            "n_levels": 4,
            "log2_hashmap_size": 12,
            "base_resolution": 8,
            "desired_resolution": 64,
            "hash_variant": "tcnn",
        },
        "network": {"n_neurons": 64, "n_hidden_layers": 1},
        "dir_encoding": {"degree": 4},
        "rgb_network": {"n_neurons": 64, "n_hidden_layers": 2},
    },
}

G = 16
N_CASCADES = 2  # aabb_scale=1 -> minimum of 2 (occupancy_sampler.cu:611-612)


def slow_morton(x, y, z):
    """Bit-by-bit Morton encode, independent of ngp_tpu.utils.morton."""
    code = 0
    for i in range(10):
        code |= ((x >> i) & 1) << (3 * i)
        code |= ((y >> i) & 1) << (3 * i + 1)
        code |= ((z >> i) & 1) << (3 * i + 2)
    return code


def cell_value(c, x, y, z):
    return float(c * 1_000_000 + z * 10_000 + y * 100 + x) / 1e4


def build_reference_grid():
    """Density grid in the reference's layout: cascade-major, Morton within."""
    grid = np.zeros(N_CASCADES * G**3, np.float32)
    for c in range(N_CASCADES):
        for z in range(G):
            for y in range(G):
                for x in range(G):
                    grid[c * G**3 + slow_morton(x, y, z)] = cell_value(c, x, y, z)
    return grid


def test_morton_helpers_match_independent_encoder():
    from ngp_tpu.utils.morton import density_grid_from_reference, density_grid_to_reference

    ref = build_reference_grid()
    lin = density_grid_from_reference(ref, G, N_CASCADES)
    # our linear layout: d = z*G^2 + y*G + x, x fastest (grid/occupancy.py)
    for c, x, y, z in [(0, 0, 0, 0), (0, 15, 3, 7), (1, 1, 2, 3), (1, 15, 15, 15), (0, 5, 0, 11)]:
        d = c * G**3 + z * G * G + y * G + x
        assert lin[d] == np.float32(cell_value(c, x, y, z)), (c, x, y, z)
    # inverse is exact
    np.testing.assert_array_equal(density_grid_to_reference(lin, G, N_CASCADES), ref)


def _reference_params_binary(config, model, params):
    """Pack params the way tcnn lays them out, independently of
    pack_reference_params: per-matrix row-major (out, in) loops."""
    from ngp_tpu.ops.hash_encoding import as_level_major

    out = []
    for w in params["density_mlp"]:  # ours are (in, out)
        w = np.asarray(w, np.float32)
        for r in range(w.shape[1]):  # tcnn row r = output unit r
            out.append(w[:, r])
    rgb = [np.asarray(w, np.float32) for w in params["rgb_mlp"]]
    for w in rgb[:-1]:
        for r in range(w.shape[1]):
            out.append(w[:, r])
    last = np.zeros((rgb[-1].shape[0], 16), np.float32)  # padded_output_width
    last[:, : rgb[-1].shape[1]] = rgb[-1]
    for r in range(16):
        out.append(last[:, r])
    tbl = np.asarray(as_level_major(params["hash_table"], model.grid_spec), np.float32)
    for level in range(model.grid_spec.n_levels):
        for e in range(model.grid_spec.sizes[level]):
            out.append(tbl[level, e, :])  # entry-major, F fast
    return np.concatenate(out).astype(np.float16)


def test_import_true_layout_fixture(tmp_path):
    """Hand-built Morton-grid + __half snapshot imports with the grid cells
    landing at the right linear addresses and occupancy marking them."""
    import jax

    from ngp_tpu.models.ngp import NGPModel
    from ngp_tpu.utils.config import NGPConfig

    config = NGPConfig.from_json(CFG)
    model = NGPModel.create(config.network)
    params = model.init(jax.random.PRNGKey(3))
    flat = _reference_params_binary(config, model, params)

    doc = dict(CFG)
    doc["snapshot"] = {
        "n_params": int(flat.size),
        "params_type": "__half",
        "params_binary": flat.tobytes(),
        "density_grid": [float(v) for v in build_reference_grid()],
        "scene_scale": 0.33,
        "scene_offset": [0.5, 0.5, 0.5],
    }
    p = tmp_path / "true_layout.msgpack"
    with open(p, "wb") as f:
        f.write(msgpack.packb(doc, use_bin_type=True))

    tb = Testbed()
    tb.load_snapshot(str(p))
    density = np.asarray(tb._state.grid.density)
    for c, x, y, z in [(0, 0, 0, 0), (0, 9, 4, 2), (1, 3, 14, 8), (1, 15, 15, 15)]:
        d = c * G**3 + z * G * G + y * G + x
        np.testing.assert_allclose(density[d], cell_value(c, x, y, z), rtol=1e-6)
    # occupancy: grid values far above min_optical_thickness must mark their
    # own (x, y, z) cell in OUR (c, x, y, z) bitfield
    occ = np.asarray(tb._state.grid.occupancy)
    assert occ[0, 9, 4, 2], "imported hot cell not occupied at its linear address"
    # params: __half quantization of our independent packing round-trips
    from ngp_tpu.ops.hash_encoding import as_level_major

    sp = model.grid_spec
    got = np.asarray(as_level_major(tb._state.params["hash_table"], sp))
    want = np.asarray(as_level_major(params["hash_table"], sp)).astype(np.float16).astype(np.float32)
    for level in range(sp.n_levels):
        np.testing.assert_allclose(got[level, : sp.sizes[level]], want[level, : sp.sizes[level]], atol=0, rtol=0)
    for k in ("density_mlp", "rgb_mlp"):
        for a, b in zip(tb._state.params[k], params[k], strict=True):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b, np.float32).astype(np.float16).astype(np.float32), atol=0, rtol=0
            )


def test_export_writes_morton_order(tmp_path):
    """save_snapshot(reference_format=True) writes the density grid in the
    order the reference will index it: grid[morton3d(x,y,z)] per cascade."""
    train_json, _ = write_synthetic_dataset(tmp_path, n_train=4, n_test=1, width=32, height=32)
    tb = Testbed()
    tb.load_model_config_dict(CFG)
    tb._trainer.sample_capacity = 1 << 13
    tb.load_training_data(train_json)
    tb.train(16, 1 << 12)
    snap = tmp_path / "exported.msgpack"
    tb.save_snapshot(str(snap), reference_format=True)

    with open(snap, "rb") as f:
        doc = msgpack.unpackb(f.read(), raw=False, strict_map_key=False)
    written = np.asarray(doc["snapshot"]["density_grid"], np.float32)
    ours = np.asarray(tb._state.grid.density)
    assert written.shape == ours.shape
    rng = np.random.default_rng(0)
    for _ in range(64):
        c = int(rng.integers(N_CASCADES))
        x, y, z = (int(v) for v in rng.integers(0, G, 3))
        d_lin = c * G**3 + z * G * G + y * G + x
        d_ref = c * G**3 + slow_morton(x, y, z)
        np.testing.assert_allclose(written[d_ref], ours[d_lin], rtol=1e-6)
