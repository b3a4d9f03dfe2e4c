"""Packed H2D transfer (xyz f16 + rgb u8, device-side unpack) vs exact f32.

The packed path is the throughput mode for the tunnel-bound static_test
sweep (bench.py --sweep); its only deviations are the f16 coordinate
quantisation and the on-device XYZ/rgb recompute. The metric it produces
must agree with the exact path to quantisation tolerance, and the
reconstruction itself must match the sampler's host-side attribute math.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.data.datasets import TestingDataset
from gfs3dseg_gws_tpu.data.registry import DatasetRegistry
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.parallel.steps import (pack_batch, unpack_labels,
                                             unpack_points)
from gfs3dseg_gws_tpu.pipelines.gfs import eval_batches, validate

NPTS = 96
NUM_GW = 10


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packed_h2d"))
    _, test_dir = make_synthetic_blocks(root, n_train_blocks=4,
                                        n_test_blocks=13,
                                        points_per_block=1200, seed=15)
    reg = DatasetRegistry("s3dis", 0, test_dir)
    base = sorted(reg.train_classes)
    novel = sorted(reg.test_classes)
    order = base + novel
    names = sorted(order)
    ds = TestingDataset(test_dir, names, order,
                        {c: reg.class2scans[c] for c in names},
                        num_point=NPTS)
    return ds, base, novel, order


def test_unpack_matches_exact_attributes(setup):
    """unpack_points(single u8 buffer) == dense features up to f16
    quantisation; labels ride in byte 9 (labels yield is the None
    sentinel meaning 'one transfer, read labels on device')."""
    ds, *_ = setup
    exact = next(eval_batches(ds, 4, h2d="exact"))
    buf, labels_none, valid = next(eval_batches(ds, 4, h2d="packed"))
    assert labels_none is None
    assert buf.dtype == np.uint8 and buf.shape[-1] == 10
    rebuilt = np.asarray(unpack_points(jnp.asarray(buf)))
    dense = exact[0]
    # xyz: f16 quantisation of the same values
    np.testing.assert_allclose(rebuilt[..., :3], dense[..., :3],
                               rtol=2e-3, atol=2e-3)
    # rgb: exact uint8 recovery (1-ulp f32 division tolerance)
    np.testing.assert_allclose(rebuilt[..., 3:6], dense[..., 3:6],
                               rtol=0, atol=1e-6)
    # XYZ: recomputed from quantised xyz
    np.testing.assert_allclose(rebuilt[..., 6:9], dense[..., 6:9],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(
        np.asarray(unpack_labels(jnp.asarray(buf))), exact[1])
    assert valid == exact[2]


def test_pack_batch_roundtrip():
    """pack_batch -> unpack on crafted f16-exact data is EXACT: xyz
    bitwise, rgb k/255 recovery, labels byte 9, XYZ to f32 tolerance."""
    rng = np.random.default_rng(3)
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float16).astype(
        np.float32)           # f16-representable -> quantisation-free
    rgb = rng.integers(0, 256, (2, 64, 3)).astype(np.float32) / 255.0
    shifted = xyz - xyz.min(axis=1, keepdims=True)
    XYZ = shifted / shifted.max(axis=1, keepdims=True)
    pts = np.concatenate([xyz, rgb, XYZ], axis=-1)
    lbl = rng.integers(0, 21, (2, 64))
    buf = pack_batch(pts, lbl)
    assert buf.shape == (2, 64, 10) and buf.dtype == np.uint8
    out = np.asarray(unpack_points(jnp.asarray(buf)))
    np.testing.assert_array_equal(out[..., 0:3], xyz)
    np.testing.assert_allclose(out[..., 3:6], rgb, rtol=0, atol=1e-7)
    np.testing.assert_allclose(out[..., 6:9], XYZ, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(unpack_labels(jnp.asarray(buf))), lbl)
    # stacked (S, B, N, 9) form used by steps_per_dispatch chunks
    buf_s = pack_batch(np.stack([pts, pts]), np.stack([lbl, lbl]))
    assert buf_s.shape == (2, 2, 64, 10)
    np.testing.assert_array_equal(buf_s[0], buf)


def test_pack_batch_rejects_unpackable_data():
    """The packed wire format carries exactly xyzrgbXYZ + u8 labels; other
    --pc_attribs widths and out-of-u8 labels (negative ignore ids) must
    fail loudly, not wrap silently (auto h2d makes packing the TPU
    default)."""
    rng = np.random.default_rng(11)
    six = rng.random((2, 32, 6)).astype(np.float32)     # xyzrgb only
    with pytest.raises(ValueError, match="9-feature"):
        pack_batch(six, np.zeros((2, 32), np.int32))
    pts = rng.random((2, 32, 9)).astype(np.float32)
    with pytest.raises(ValueError, match="u8 range"):
        pack_batch(pts, np.full((2, 32), -1, np.int32))
    with pytest.raises(ValueError, match="u8 range"):
        pack_batch(pts, np.full((2, 32), 300, np.int32))


def test_batch_putter_falls_back_to_exact():
    """make_batch_putter(packed=True) with unpackable data warns ONCE and
    permanently drops to the exact dense path instead of crashing the
    default-on TPU packed mode."""
    from gfs3dseg_gws_tpu.parallel.mesh import make_batch_putter

    rng = np.random.default_rng(12)
    six = rng.random((2, 32, 6)).astype(np.float32)
    lbl = np.zeros((2, 32), np.int32)
    put = make_batch_putter(None, packed=True)
    with pytest.warns(RuntimeWarning, match="packed H2D unavailable"):
        p, l = put(six, lbl)
    assert p.shape == (2, 32, 6) and l.shape == (2, 32)   # dense pair
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")                    # warns only once
        p, l = put(six, lbl)
    assert p.shape[-1] == 6

    # negative ignore labels: same fallback, 9-feature points ship dense
    pts = rng.random((2, 32, 9)).astype(np.float32)
    neg = np.full((2, 32), -1, np.int32)
    put2 = make_batch_putter(None, packed=True)
    with pytest.warns(RuntimeWarning, match="packed H2D unavailable"):
        p, l = put2(pts, neg)
    assert p.dtype == np.float32 and l.min() == -1


def test_unpack_degenerate_span_is_finite():
    """A block coplanar in one axis (constant z) must unpack to finite
    XYZ — matches the native loader's span<=0 -> 1.0 guard
    (blockloader.cc:272); without it the default TPU packed path feeds
    0/0 = NaN into training."""
    rng = np.random.default_rng(7)
    xyz = rng.standard_normal((1, 64, 3)).astype(np.float16).astype(
        np.float32)
    xyz[..., 2] = 1.25                      # zero span in z
    rgb = rng.integers(0, 256, (1, 64, 3)).astype(np.float32) / 255.0
    pts = np.concatenate([xyz, rgb, np.zeros_like(xyz)], axis=-1)
    lbl = np.zeros((1, 64), np.int64)
    out = np.asarray(unpack_points(jnp.asarray(pack_batch(pts, lbl))))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[..., 8], 0.0)   # shifted z == 0


def test_train_step_packed_matches_exact():
    """The GFS train step fed the u8 buffer (as both args) reproduces the
    dense-f32 step on f16-exact inputs — transfer packing changes bytes
    on the wire, not the update."""
    from gfs3dseg_gws_tpu.parallel import (
        TrainState, jit_init, make_gfs_optimizer, make_gfs_train_step)

    n, ngw = 64, 8
    model = GWCAPL(classes=13, base_num=7, num_gw=ngw, main_dim=16,
                   edgeconv_widths=((8, 8),) * 3, mlp_widths=(16, 16),
                   base_widths=(8, 8), output_dim=8, k=5, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(5)
    xyz = host.standard_normal((2, n, 3)).astype(np.float16).astype(
        np.float32)
    rgb = host.integers(0, 256, (2, n, 3)).astype(np.float32) / 255.0
    shifted = xyz - xyz.min(axis=1, keepdims=True)
    XYZ = shifted / shifted.max(axis=1, keepdims=True)
    pts = np.concatenate([xyz, rgb, XYZ], axis=-1)
    lbl = host.integers(0, 8, (2, n)).astype(np.int32)
    gp = jax.random.normal(jax.random.PRNGKey(1), (ngw, 24))
    buf = jnp.asarray(pack_batch(pts, lbl))
    # the dense reference input is the device-side unpack itself, so the
    # two steps must agree BITWISE — sub-ulp input differences would
    # otherwise flip Adam's sign on noise-level gradients; the
    # quantisation delta vs host f32 is pinned by the attribute test above
    pts_dense = unpack_points(buf)
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng}, pts_dense,
                        jnp.asarray(lbl), gp, train=True)
    # SGD, not Adam: XLA fuses the in-jit unpack differently than the
    # two-stage (materialise -> step) path, so activations differ by ~1 ulp;
    # Adam's g/sqrt(v) would amplify that into sign flips on noise-level
    # gradients, while the SGD update stays proportional to the gradient
    import optax
    tx = optax.sgd(1e-2)
    step = make_gfs_train_step(model, mesh=None, donate=False)

    state_a = TrainState.create(variables["params"],
                                variables["batch_stats"], tx)
    state_a, loss_a, acc_a = step(state_a, pts_dense,
                                  jnp.asarray(lbl), gp, rng)

    state_b = TrainState.create(variables["params"],
                                variables["batch_stats"], tx)
    state_b, loss_b, acc_b = step(state_b, buf, buf, gp, rng)

    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-6)
    assert float(acc_b) == float(acc_a)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        state_a.params, state_b.params)


def test_validate_packed_matches_exact(setup):
    ds, base, novel, order = setup
    model = GWCAPL(classes=13, base_num=len(base), num_gw=NUM_GW, main_dim=16,
                   edgeconv_widths=((8, 8),) * 3, mlp_widths=(16, 16),
                   base_widths=(8, 8), output_dim=8, k=5, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "fake": rng},
        jnp.zeros((1, NPTS, 9)), jnp.zeros((1, NPTS), jnp.int32),
        jax.random.normal(jax.random.PRNGKey(1), (NUM_GW, 24)), train=True)
    gp = jax.random.normal(jax.random.PRNGKey(1), (NUM_GW, 24))
    gened = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (13, 16)))
    base_c = np.ones((len(base), NUM_GW), np.float32)
    novel_c = np.ones((len(novel), NUM_GW), np.float32)

    exact = validate(model, variables, gp, ds, gened, base_c, novel_c,
                     order, novel, 13, batch_size=4, h2d="exact")
    packed = validate(model, variables, gp, ds, gened, base_c, novel_c,
                      order, novel, 13, batch_size=4, h2d="packed")
    # mIoU splits agree to quantisation tolerance
    for a, b in zip(exact[:4], packed[:4]):
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.02)


def _copy_dataset(ds, dst_root):
    """A TestingDataset clone over a copied static_test dir (mutating the
    module fixture's pickles would corrupt the other tests)."""
    import copy
    import shutil

    dst = os.path.join(dst_root, os.path.basename(ds.save_path))
    shutil.copytree(ds.save_path, dst)
    ds2 = copy.copy(ds)
    ds2.save_path = dst
    for f in os.listdir(dst):
        if f.startswith("packed_"):
            os.remove(os.path.join(dst, f))
    return ds2


def test_packed_q_overflow_falls_back_to_exact_cache(setup, tmp_path):
    """f16-overflowing coordinates must NOT be served from the quantised
    cache as inf (advisor r3): the build raises, leaves no tmp/partial
    files, and eval_batches lands on the exact memmap cache — not the
    per-block pickle iterator."""
    import pickle as pkl

    ds, *_ = setup
    ds2 = _copy_dataset(ds, str(tmp_path))
    name = ds2.data_list[0]
    p = os.path.join(ds2.save_path, "pcd", name)
    with open(p, "rb") as f:
        blk = pkl.load(f)
    blk = np.asarray(blk, np.float32)
    blk[:, 0] += 1.0e6  # UTM-style offset: finite f32, inf as f16
    with open(p, "wb") as f:
        pkl.dump(blk, f)

    with pytest.raises(ValueError, match="float16"):
        ds2.packed_q_arrays()
    leftovers = [f for f in os.listdir(ds2.save_path)
                 if f.startswith("packed_xyz16") or ".tmp" in f]
    assert not leftovers, leftovers

    points, labels, valid = next(eval_batches(ds2, 4, h2d="packed"))
    assert points.dtype == np.float32 and labels is not None
    # the fallback built (and will reuse) the dense memmap cache
    assert os.path.exists(os.path.join(ds2.save_path, "packed_pcd.npy"))
    exact_pts, exact_lbl, _ = next(eval_batches(ds2, 4, h2d="exact"))
    np.testing.assert_array_equal(points, exact_pts)
    np.testing.assert_array_equal(labels, exact_lbl)


def test_packed_q_clips_out_of_range_rgb(setup, tmp_path):
    """rgb outside [0,1] must clip to the u8 range, not wrap modulo 256
    (pack_batch semantics; advisor r3)."""
    import pickle as pkl

    ds, *_ = setup
    ds2 = _copy_dataset(ds, str(tmp_path))
    name = ds2.data_list[0]
    p = os.path.join(ds2.save_path, "pcd", name)
    with open(p, "rb") as f:
        blk = pkl.load(f)
    blk = np.asarray(blk, np.float32)
    blk[:, 3] = 2.0  # rint(2*255)=510: wraps to 254 without the clip
    with open(p, "wb") as f:
        pkl.dump(blk, f)

    xyz, rgb, lbl, lut = ds2.packed_q_arrays()
    idx = ds2.data_list.index(name)
    assert rgb[idx, :, 0].min() == 255


def test_pack_batch_overflow_raises_and_putter_self_heals():
    """f16-overflowing coords must raise (not warn-and-ship-inf) so the
    batch putter's designed ValueError fallback drops to exact transfers
    permanently — one warning, finite features, training unharmed."""
    from gfs3dseg_gws_tpu.parallel.mesh import make_batch_putter

    pts = np.random.default_rng(0).uniform(0, 1, (2, 16, 9)).astype(
        np.float32)
    pts[..., 0] += 1.0e6  # finite f32, inf as f16
    lbl = np.zeros((2, 16), np.int32)
    with pytest.raises(ValueError, match="float16"):
        pack_batch(pts, lbl)

    put_pair = make_batch_putter(None, packed=True)
    with pytest.warns(RuntimeWarning, match="packed H2D unavailable"):
        p_dev, l_dev = put_pair(pts, lbl)
    assert np.isfinite(np.asarray(p_dev)).all()
    # permanent drop: second call is exact with no further warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        p_dev, l_dev = put_pair(pts, lbl)
    assert np.isfinite(np.asarray(p_dev)).all()


def _tiny_model_args(setup):
    ds, base, novel, order = setup
    model = GWCAPL(classes=13, base_num=len(base), num_gw=NUM_GW, main_dim=16,
                   edgeconv_widths=((8, 8),) * 3, mlp_widths=(16, 16),
                   base_widths=(8, 8), output_dim=8, k=5, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "fake": rng},
        jnp.zeros((1, NPTS, 9)), jnp.zeros((1, NPTS), jnp.int32),
        jax.random.normal(jax.random.PRNGKey(1), (NUM_GW, 24)), train=True)
    gp = jax.random.normal(jax.random.PRNGKey(1), (NUM_GW, 24))
    gened = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (13, 16)))
    base_c = np.ones((len(base), NUM_GW), np.float32)
    novel_c = np.ones((len(novel), NUM_GW), np.float32)
    return (model, variables, gp, ds, gened, base_c, novel_c, order, novel,
            13)


def test_validate_device_cache_matches_and_skips_host_path(setup,
                                                           monkeypatch):
    """The device-resident eval cache (periodic-validation fast path) is
    (a) metric-identical to streaming, and (b) actually device-resident:
    the second sweep with a shared cache never re-enters the host batch
    iterator."""
    import gfs3dseg_gws_tpu.pipelines.gfs as gfs_mod

    args = _tiny_model_args(setup)
    streamed = validate(*args, batch_size=4, h2d="packed")

    calls = {"n": 0}
    real_eval_batches = gfs_mod.eval_batches

    def counting(*a, **k):
        calls["n"] += 1
        return real_eval_batches(*a, **k)

    def entry_keys(c):
        # the single-dispatch scan path CONSOLIDATES an entry into its
        # "stacked" form on the first cached reuse (replacing the
        # per-batch list to keep HBM at one copy); count logical entries
        return {k[:-1] if k[-1] == "stacked" else k for k in c}

    monkeypatch.setattr(gfs_mod, "eval_batches", counting)
    cache = {}
    first = validate(*args, batch_size=4, h2d="packed", device_cache=cache)
    assert calls["n"] == 1 and len(entry_keys(cache)) == 1
    second = validate(*args, batch_size=4, h2d="packed", device_cache=cache)
    assert calls["n"] == 1, "cached sweep must not re-read the host data"
    for a, b, c in zip(streamed[:4], first[:4], second[:4]):
        assert a == b == c
    np.testing.assert_array_equal(streamed[4], second[4])
    # a different batch size is a different key — no stale-shape reuse
    other = validate(*args, batch_size=3, h2d="packed", device_cache=cache)
    assert calls["n"] == 2 and len(entry_keys(cache)) == 2
    for a, b in zip(streamed[:4], other[:4]):
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.02)


def test_validate_device_cache_cap_and_disable(setup, monkeypatch):
    """GFS3D_DEVICE_CACHE_MB bounds what gets pinned (0 = stream every
    sweep, cache stays empty) and GFS3D_NO_DEVICE_CACHE=1 disables the
    cache even when a dict is supplied; results are unaffected."""
    args = _tiny_model_args(setup)
    streamed = validate(*args, batch_size=4, h2d="packed")

    monkeypatch.setenv("GFS3D_DEVICE_CACHE_MB", "0")
    cache = {}
    capped = validate(*args, batch_size=4, h2d="packed", device_cache=cache)
    assert cache == {}, "over-cap sweep must not pin anything"
    monkeypatch.delenv("GFS3D_DEVICE_CACHE_MB")

    monkeypatch.setenv("GFS3D_NO_DEVICE_CACHE", "1")
    disabled = validate(*args, batch_size=4, h2d="packed",
                        device_cache=cache)
    assert cache == {}
    for a, b, c in zip(streamed[:4], capped[:4], disabled[:4]):
        assert a == b == c


def test_validate_device_cache_keys_on_dataset(setup, monkeypatch):
    """One cache dict shared across two DIFFERENT datasets must not serve
    the first dataset's pinned batches as the second's (advisor r4: the
    key previously omitted dataset identity). Each dataset gets its own
    entry and its own metrics."""
    import gfs3dseg_gws_tpu.pipelines.gfs as gfs_mod

    model, variables, gp, ds, *rest = _tiny_model_args(setup)
    # second dataset: same class tables, fewer blocks, own directory
    import tempfile

    root2 = tempfile.mkdtemp(prefix="packed_h2d_ds2_")
    _, test_dir2 = make_synthetic_blocks(root2, n_train_blocks=2,
                                         n_test_blocks=5,
                                         points_per_block=1200, seed=77)
    reg2 = DatasetRegistry("s3dis", 0, test_dir2)
    names2 = sorted(sorted(reg2.train_classes) + sorted(reg2.test_classes))
    ds2 = TestingDataset(test_dir2, names2, ds.learning_order,
                         {c: reg2.class2scans[c] for c in names2},
                         num_point=NPTS)
    assert len(ds2) != len(ds)

    calls = {"n": 0}
    real_eval_batches = gfs_mod.eval_batches

    def counting(*a, **k):
        calls["n"] += 1
        return real_eval_batches(*a, **k)

    monkeypatch.setattr(gfs_mod, "eval_batches", counting)
    cache = {}
    full = validate(model, variables, gp, ds, *rest, batch_size=4,
                    h2d="packed", device_cache=cache)
    half = validate(model, variables, gp, ds2, *rest, batch_size=4,
                    h2d="packed", device_cache=cache)
    assert calls["n"] == 2 and len(cache) == 2, \
        "each dataset must fill its own cache entry"
    half_fresh = validate(model, variables, gp, ds2, *rest, batch_size=4,
                          h2d="packed")
    for a, b in zip(half[:4], half_fresh[:4]):
        assert a == b
    np.testing.assert_array_equal(half[4], half_fresh[4])
    # and the big set's counts differ from the small set's
    assert not np.array_equal(full[4], half[4])


def test_validate_device_cache_bad_env_warns(setup, monkeypatch):
    """A malformed GFS3D_DEVICE_CACHE_MB downgrades to the 512 MB default
    with a warning instead of crashing the validation sweep (advisor r4);
    with caching disabled the env var is never parsed at all."""
    args = _tiny_model_args(setup)
    monkeypatch.setenv("GFS3D_DEVICE_CACHE_MB", "lots")
    # no cache dict -> env var untouched -> no warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        streamed = validate(*args, batch_size=4, h2d="packed")
    cache = {}
    with pytest.warns(UserWarning, match="GFS3D_DEVICE_CACHE_MB"):
        cached = validate(*args, batch_size=4, h2d="packed",
                          device_cache=cache)
    assert len(cache) == 1, "fallback default must still pin the set"
    for a, b in zip(streamed[:4], cached[:4]):
        assert a == b


def test_validate_multi_device_cache_scan_matches(setup):
    """The multi-seed cached sweep's single-dispatch scan path
    (make_gfs_eval_scan_step, multi=True) is metric-identical to the
    per-batch streaming path for every seed."""
    from gfs3dseg_gws_tpu.pipelines.gfs import validate_multi

    model, variables, gp, ds, gened, base_c, novel_c, order, novel, ncls = \
        _tiny_model_args(setup)
    geneds = np.stack([gened, gened * 0.9 + 0.1])
    novels = np.stack([novel_c, novel_c])
    streamed = validate_multi(model, variables, gp, ds, geneds, base_c,
                              novels, order, novel, ncls, batch_size=4,
                              h2d="packed")
    cache = {}
    # first call fills the per-batch cache; second reuses it via the scan
    validate_multi(model, variables, gp, ds, geneds, base_c, novels,
                   order, novel, ncls, batch_size=4, h2d="packed",
                   device_cache=cache)
    scanned = validate_multi(model, variables, gp, ds, geneds, base_c,
                             novels, order, novel, ncls, batch_size=4,
                             h2d="packed", device_cache=cache)
    assert any(k[-1] == "stacked" for k in cache), \
        "scan path did not engage"
    for s_row, c_row in zip(streamed, scanned):
        for a, b in zip(s_row[:4], c_row[:4]):
            assert a == b
        np.testing.assert_array_equal(s_row[4], c_row[4])


def test_validate_scan_disable_midrun_serves_from_stacked(setup,
                                                          monkeypatch):
    """After an entry is consolidated into its stacked form, a caller that
    disables the scan path mid-run (GFS3D_NO_SCAN_EVAL=1) must be served
    per-batch slices of the stacked buffers — same metrics, no host
    re-stream."""
    import gfs3dseg_gws_tpu.pipelines.gfs as gfs_mod

    args = _tiny_model_args(setup)
    streamed = validate(*args, batch_size=4, h2d="packed")
    cache = {}
    validate(*args, batch_size=4, h2d="packed", device_cache=cache)
    validate(*args, batch_size=4, h2d="packed", device_cache=cache)
    assert any(k[-1] == "stacked" for k in cache)

    calls = {"n": 0}
    real = gfs_mod.eval_batches

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(gfs_mod, "eval_batches", counting)
    monkeypatch.setenv("GFS3D_NO_SCAN_EVAL", "1")
    noscan = validate(*args, batch_size=4, h2d="packed", device_cache=cache)
    assert calls["n"] == 0, "must serve from the stacked cache, not host"
    for a, b in zip(streamed[:4], noscan[:4]):
        assert a == b
    np.testing.assert_array_equal(streamed[4], noscan[4])
