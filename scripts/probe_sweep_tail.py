"""Attribute the cached-sweep gap: dispatch+compute vs result D2H.

The r4 device-cached sweep runs 1,587-1,598 blocks/s/chip (641 ms /
1024 blocks) while the fori_loop eval bench shows an 1,849 device rate
(554 ms). Hypothesis: the residual ~87 ms is the 12 small D2H transfers
(3 per batch: cm/acc/nacc) each paying axon-tunnel fixed latency. This
probe times, on the warm cached batches:

  A. 4 eval-step dispatches + ONE scalar sync (float of the last cm's
     sum) — compute + dispatch, minimal D2H;
  B. 4 dispatches + full consume of all 3 outputs per batch (what
     validate does today);
  C. 4 dispatches of a packing wrapper returning ONE (C*C+2,) array +
     per-batch consume of that single array.

Run on the TPU host while otherwise idle.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.data.datasets import TestingDataset
from gfs3dseg_gws_tpu.data.registry import DatasetRegistry
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.parallel.steps import jit_init, make_gfs_eval_step
from gfs3dseg_gws_tpu.pipelines.gfs import _device_eval_batches
from gfs3dseg_gws_tpu.parallel.steps import cached_step
from gfs3dseg_gws_tpu.utils.env import env_flag


def main():
    npts, n_blocks, batch = 2048, 1024, 256
    root = f"/tmp/gfs3d_bench_sweep_n{npts}_m{n_blocks}"
    test_dir = os.path.join(root, "blocks_bs1.0_s1.0_test")
    if not os.path.isdir(test_dir):
        make_synthetic_blocks(root, n_train_blocks=2, n_test_blocks=n_blocks,
                              points_per_block=npts + npts // 2, seed=9)
    reg = DatasetRegistry("s3dis", 0, test_dir)
    order = sorted(reg.train_classes) + sorted(reg.test_classes)
    names = sorted(order)
    ds = TestingDataset(test_dir, names, order,
                        {c: reg.class2scans[c] for c in names},
                        num_point=npts)
    model = GWCAPL(classes=13, base_num=7, num_gw=150, main_dim=128,
                   use_pallas=True)
    rng = jax.random.PRNGKey(0)
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng},
                         jnp.zeros((2, npts, 9)),
                         jnp.zeros((2, npts), jnp.int32),
                         jax.random.normal(jax.random.PRNGKey(3), (150, 192)),
                         train=True)
    gp = jax.random.normal(jax.random.PRNGKey(3), (150, 192))
    gened = jnp.asarray(np.random.default_rng(4).normal(
        size=(13, 128)).astype(np.float32))
    base_c = jnp.ones((7, 150), jnp.float32)
    novel_c = jnp.ones((6, 150), jnp.float32)

    cache = {}
    batches = list(_device_eval_batches(ds, batch, "auto", None, cache))
    print(f"{len(batches)} cached device batches", file=sys.stderr)

    eval_step = make_gfs_eval_step(model, 13, None)

    # packing variant: same math, outputs concatenated into ONE array
    from gfs3dseg_gws_tpu.ops.metrics import confusion_matrix

    @jax.jit
    def step_packed(variables, points, labels, gp, gened_proto, base_coding,
                    novel_coding, valid):
        from gfs3dseg_gws_tpu.parallel.steps import (unpack_labels,
                                                     unpack_points)
        pts = unpack_points(points)
        lbl = unpack_labels(labels)
        logits, gp_acc, gp_nacc = model.apply(
            variables, pts, gp, gened_proto, base_coding, novel_coding,
            lbl, valid, method="evaluate")
        pred = jnp.argmax(logits, axis=-1)
        row_ok = (jnp.arange(pts.shape[0]) < valid)
        mask = jnp.broadcast_to(row_ok[:, None], lbl.shape)
        cm = confusion_matrix(pred, lbl, 13, mask)
        return jnp.concatenate(
            [cm.reshape(-1), gp_acc[None], gp_nacc[None]])

    valid = jnp.int32(batch)

    def run_A():
        last = None
        for pts, lbl, v in batches:
            last = eval_step(variables, pts, lbl, gp, gened, base_c,
                             novel_c, valid)
        return float(last[0].sum())    # one scalar sync

    def run_B():
        out = []
        for pts, lbl, v in batches:
            out.append(eval_step(variables, pts, lbl, gp, gened, base_c,
                                 novel_c, valid))
        tot = 0.0
        for cm, a, na in out:
            tot += float(np.asarray(cm, np.float64).sum())
            tot += float(a) + float(na)
        return tot

    def run_C():
        out = []
        for pts, lbl, v in batches:
            out.append(step_packed(variables, pts, lbl, gp, gened, base_c,
                                   novel_c, valid))
        tot = 0.0
        for r in out:
            arr = np.asarray(r, np.float64)
            tot += arr.sum()
        return tot

    # warm all three
    run_A(); run_B(); run_C()
    for name, fn in (("A dispatch+1sync", run_A),
                     ("B 3-array consume", run_B),
                     ("C packed 1-array", run_C)):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name}: best {best*1e3:7.1f} ms  "
              f"({n_blocks/best:7.1f} blocks/s)  all "
              f"{[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
