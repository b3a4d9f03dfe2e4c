"""The single-sweep multi-seed evaluation must match per-seed evaluation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.data.datasets import TestingDataset
from gfs3dseg_gws_tpu.data.registry import DatasetRegistry
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.pipelines.gfs import validate, validate_multi

NPTS = 96
NUM_GW = 10


def test_multi_matches_per_seed(tmp_path):
    root = str(tmp_path)
    _, test_dir = make_synthetic_blocks(root, n_train_blocks=4,
                                        n_test_blocks=13,
                                        points_per_block=1200, seed=15)
    reg = DatasetRegistry("s3dis", 0, test_dir)
    base = sorted(reg.train_classes)
    novel = sorted(reg.test_classes)
    order = base + novel
    names = sorted(order)
    val_ds = TestingDataset(test_dir, names, order,
                            {c: reg.class2scans[c] for c in names},
                            num_point=NPTS)

    model = GWCAPL(classes=13, base_num=len(base), num_gw=NUM_GW, main_dim=16,
                   edgeconv_widths=((8, 8),) * 3, mlp_widths=(16, 16),
                   base_widths=(8, 8), output_dim=8, k=5, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, NPTS, 9))
    y0 = jnp.zeros((1, NPTS), jnp.int32)
    gp = jax.random.normal(jax.random.PRNGKey(1), (NUM_GW, 24))
    variables = model.init({"params": rng, "dropout": rng, "fake": rng},
                           x0, y0, gp, train=True)

    s = 3
    geneds = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                          (s, 13, 16)))
    base_coding = np.asarray(jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.4, (len(base), NUM_GW)), np.float32)
    novel_codings = np.asarray(jax.random.bernoulli(
        jax.random.PRNGKey(4), 0.4, (s, len(novel), NUM_GW)), np.float32)

    multi = validate_multi(model, variables, gp, val_ds, geneds, base_coding,
                           novel_codings, order, novel, 13, batch_size=4)
    for i in range(s):
        single = validate(model, variables, gp, val_ds, geneds[i],
                          base_coding, novel_codings[i], order, novel, 13,
                          batch_size=4)
        np.testing.assert_allclose(multi[i][4], single[4], rtol=1e-5,
                                   atol=1e-6, err_msg=f"seed {i}")
        np.testing.assert_allclose(multi[i][0], single[0], rtol=1e-5)

    # gp_acc / gp_novel_acc must exclude padded rows: evaluating a padded
    # batch with valid=2 must match evaluating just the 2 real blocks
    # (the eval forward is per-block independent in eval mode)
    key = jax.random.PRNGKey(7)
    pts = jax.random.normal(key, (4, NPTS, 9))
    lbl = jax.random.randint(jax.random.PRNGKey(8), (4, NPTS), 0, 13)
    _, acc_pad, nacc_pad = model.apply(
        variables, pts, gp, jnp.asarray(geneds[0]), jnp.asarray(base_coding),
        jnp.asarray(novel_codings[0]), lbl, jnp.int32(2), method="evaluate")
    _, acc_real, nacc_real = model.apply(
        variables, pts[:2], gp, jnp.asarray(geneds[0]),
        jnp.asarray(base_coding), jnp.asarray(novel_codings[0]), lbl[:2],
        method="evaluate")
    np.testing.assert_allclose(float(acc_pad), float(acc_real), rtol=1e-5)
    np.testing.assert_allclose(float(nacc_pad), float(nacc_real), rtol=1e-5)
