"""Base-class geometric-word coding collection: batched/jitted accumulation
must equal the reference's per-block bs=1 loop semantics
(reference train.py:156-218)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.data.datasets import PretrainBlockDataset
from gfs3dseg_gws_tpu.data.registry import DatasetRegistry
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.ops.coding import energy_multihot
from gfs3dseg_gws_tpu.pipelines.gfs import collect_base_codings

NPTS = 96
NUM_GW = 10


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coding"))
    train_dir, _ = make_synthetic_blocks(root, n_train_blocks=20,
                                         n_test_blocks=2,
                                         points_per_block=1200, seed=8)
    reg = DatasetRegistry("s3dis", 0, train_dir)
    classes = sorted(reg.train_classes)
    ds = PretrainBlockDataset(train_dir, classes,
                              {c: reg.class2scans[c] for c in classes},
                              num_point=NPTS)
    model = GWCAPL(classes=13, base_num=len(classes), num_gw=NUM_GW,
                   main_dim=16, edgeconv_widths=((8, 8),) * 3,
                   mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
                   k=5, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, NPTS, 9))
    y0 = jnp.zeros((1, NPTS), jnp.int32)
    gp = jax.random.normal(jax.random.PRNGKey(1), (NUM_GW, 24))
    variables = model.init({"params": rng, "dropout": rng, "fake": rng},
                           x0, y0, gp, train=True)
    return model, variables, gp, ds, len(classes)


def test_batched_codings_match_per_block_loop(setup, monkeypatch):
    model, variables, gp, ds, n_base = setup
    energy = 0.9

    # pin the Python loader path: the oracle below reproduces its exact
    # per-sample RNG streams (the native loader draws different, equally
    # valid samples)
    monkeypatch.setenv("GFS3D_NO_NATIVE", "1")

    # framework path: batched accumulation
    coding, bg_coding = collect_base_codings(
        model, variables, gp, ds, n_base, energy, batch_size=6, mesh=None)

    # oracle: literal bs=1 loop over the same deterministic samples —
    # per-class masked GW sums / counts, per-block bg means averaged over
    # blocks (reference train.py:172-217)
    feat_fn = jax.jit(lambda v, x: model.apply(v, x, gp, False,
                                               method="get_features")[2])
    sums = {c: np.zeros(NUM_GW) for c in range(n_base)}
    counts = {c: 0.0 for c in range(n_base)}
    bg_means = []
    # batch_iterator uses rng seeded by (seed, epoch, global_index)
    for i in range(len(ds)):
        rng = np.random.default_rng((0, 0, i))
        pc, label, _ = ds.__getitem__(i, rng=rng)
        gw = np.asarray(feat_fn(variables, jnp.asarray(pc[None])))[0]
        for c in np.unique(label):
            mask = label == c
            if c == 0:
                bg_means.append(gw[mask].mean(axis=0))
                continue
            sums[int(c) - 1] += gw[mask].sum(axis=0)
            counts[int(c) - 1] += mask.sum()

    for c in range(n_base):
        mean = sums[c] / max(counts[c], 1.0)
        ref = np.asarray(energy_multihot(jnp.asarray(mean), energy))
        np.testing.assert_array_equal(coding[c], ref,
                                      err_msg=f"class {c}")
    ref_bg = np.mean(np.stack(bg_means), axis=0)
    np.testing.assert_allclose(bg_coding, ref_bg, rtol=1e-4, atol=1e-5)


def test_coding_step_packed_matches_dense(setup):
    """make_coding_step fed the single u8 transfer buffer (as both args)
    equals the dense path on f16-exact inputs — the packed coding sweep
    changes bytes on the wire only."""
    from gfs3dseg_gws_tpu.parallel import make_coding_step, pack_batch
    from gfs3dseg_gws_tpu.parallel.steps import unpack_points

    model, variables, gp, _, n_base = setup
    host = np.random.default_rng(9)
    xyz = host.standard_normal((4, NPTS, 3)).astype(np.float16).astype(
        np.float32)
    rgb = host.integers(0, 256, (4, NPTS, 3)).astype(np.float32) / 255.0
    sh = xyz - xyz.min(axis=1, keepdims=True)
    XYZ = sh / sh.max(axis=1, keepdims=True)
    pts = np.concatenate([xyz, rgb, XYZ], axis=-1)
    lbl = host.integers(0, n_base + 1, (4, NPTS)).astype(np.int32)

    step = make_coding_step(model, n_base, mesh=None)
    buf = jnp.asarray(pack_batch(pts, lbl))
    dense = step(variables, unpack_points(buf), jnp.asarray(lbl), gp)
    packed = step(variables, buf, buf, gp)
    for a, b in zip(dense, packed):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
