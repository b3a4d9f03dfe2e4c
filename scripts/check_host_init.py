"""TPU gate: host-CPU init ~= on-device init, leaf for leaf.

`host_init` (parallel/steps.py) rests on the claim that flax init values
depend only on the RNG and the param shapes — not the backend and not the
Pallas-vs-XLA compute path. The CPU suite pins the claim CPU-vs-CPU; this
gate pins it on the real TPU: a tiny GWCAPL (so the on-device init compile
stays cheap — the full model's is the 273-403 s cost host_init exists to
avoid) is initialised once through host_init and once through the forced
on-device path (GFS3D_DEVICE_INIT=1).

Measured deviation (v5e, jax 0.9, 2026-08): the threefry random BITS are
platform-invariant, but the uniform->normal float transform (erfinv in
lecun_normal/normal initializers) rounds differently on the TPU — leaves
agree to max abs ~2.2e-5, not bitwise. That is a distribution-identical
draw from the same bits, immaterial for a random init (nothing downstream
consumes init values bit-exactly; checkpoint restore paths bypass init
values entirely). The gate therefore asserts structure + dtype equality
and a tight numeric band, and FAILS if the deviation ever grows past
1e-4 (which would indicate a real transform divergence). Must print OK.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gfs3dseg_gws_tpu.models.capl import GWCAPL
    from gfs3dseg_gws_tpu.parallel.steps import host_init, jit_init

    assert jax.default_backend() == "tpu", (
        f"TPU gate run on {jax.default_backend()}; check the tunnel")

    model = GWCAPL(classes=13, base_num=7, num_gw=12, main_dim=16,
                   edgeconv_widths=((8, 8),) * 3, mlp_widths=(16, 16),
                   base_widths=(8, 8), output_dim=8, k=5, use_pallas=True)
    rng = jax.random.PRNGKey(17)
    rngs = {"params": rng, "dropout": rng, "fake": rng}
    x = jnp.zeros((2, 64, 9))
    y = jnp.zeros((2, 64), jnp.int32)
    gp = jax.random.normal(jax.random.PRNGKey(1), (12, 24))

    v_host = host_init(model, rngs, x, y, gp, train=True)
    os.environ["GFS3D_DEVICE_INIT"] = "1"
    try:
        v_dev = jit_init(model, rngs, x, y, gp, train=True)
    finally:
        del os.environ["GFS3D_DEVICE_INIT"]

    assert (jax.tree_util.tree_structure(v_host)
            == jax.tree_util.tree_structure(v_dev))
    hl = jax.tree_util.tree_leaves(v_host)
    dl = jax.tree_util.tree_leaves(v_dev)
    worst = 0.0
    exact = 0
    for a, b in zip(hl, dl):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype, (a.shape, b.shape)
        if np.array_equal(a, b):
            exact += 1
        else:
            worst = max(worst, float(np.max(np.abs(a - b))))
    assert worst < 1e-4, f"host vs device init diverge, max abs {worst}"
    print(f"host_init vs device init: {len(hl)} leaves, {exact} bitwise "
          f"equal, max abs dev {worst:.2e} (< 1e-4: erfinv rounding only)")
    print("OK")


if __name__ == "__main__":
    main()
