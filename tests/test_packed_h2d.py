"""Packed H2D transfer (xyz f16 + rgb u8, device-side unpack) vs exact f32.

The packed path is the throughput mode for the tunnel-bound static_test
sweep (bench.py --sweep); its only deviations are the f16 coordinate
quantisation and the on-device XYZ/rgb recompute. The metric it produces
must agree with the exact path to quantisation tolerance, and the
reconstruction itself must match the sampler's host-side attribute math.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.data.datasets import TestingDataset
from gfs3dseg_gws_tpu.data.registry import DatasetRegistry
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.parallel.steps import unpack_points
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
    """unpack_points(quantised) == dense features up to f16 quantisation."""
    ds, *_ = setup
    exact = next(eval_batches(ds, 4, h2d="exact"))
    packed = next(eval_batches(ds, 4, h2d="packed"))
    assert isinstance(packed[0], tuple)
    rebuilt = np.asarray(unpack_points(tuple(jnp.asarray(p)
                                             for p in packed[0])))
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
    np.testing.assert_array_equal(packed[1], exact[1])
    assert packed[2] == exact[2]


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
