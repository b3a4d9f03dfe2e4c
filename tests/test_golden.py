"""Golden regression: a fixed-seed tiny CAPL evaluation output is pinned to
a committed fixture so future refactors can't silently change numerics.

Regenerate (only when an INTENTIONAL numeric change lands) with:
    python tests/test_golden.py --regenerate
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "capl_eval_logits.npz")


def _compute():
    from gfs3dseg_gws_tpu.models.capl import GWCAPL

    model = GWCAPL(classes=13, base_num=7, num_gw=10, main_dim=16,
                   edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                   mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
                   k=5, use_pallas=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 9))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 0, 8)
    gp = jax.random.normal(jax.random.PRNGKey(3), (10, 24))
    variables = model.init({"params": rng, "dropout": rng, "fake": rng},
                           x, y, gp, train=True)
    gened = jax.random.normal(jax.random.PRNGKey(4), (13, 16))
    bc = jnp.ones((7, 10))
    nc = jnp.ones((6, 10))
    logits, _, _ = model.apply(variables, x, gp, gened, bc, nc,
                               method="evaluate")
    return np.asarray(logits)


def test_eval_logits_match_golden():
    logits = _compute()
    assert os.path.exists(GOLDEN_PATH), (
        "golden fixture missing — run `python tests/test_golden.py "
        "--regenerate`")
    with np.load(GOLDEN_PATH) as z:
        golden = z["logits"]
    np.testing.assert_allclose(logits, golden, rtol=5e-4, atol=5e-5)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import conftest  # noqa: F401  (forces the CPU platform)

    if "--regenerate" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, logits=_compute())
        print(f"wrote {GOLDEN_PATH}")
