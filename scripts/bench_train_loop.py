"""Production GFS train-LOOP throughput: host-fed batches, H2D included.

`bench.py --train` measures the pure device rate (steps chained inside one
`lax.fori_loop`, data resident). This script measures what the production
loop in `pipelines/gfs.py::train_gfs` actually achieves when every batch is
a fresh host numpy array: per-dispatch launch latency plus the H2D
transfer, at several `--steps_per_dispatch` settings (S>1 chains S steps
into one `lax.scan` dispatch via `make_gfs_multi_train_step`; the update
sequence is bit-identical, see tests/test_parallel.py).

Each steps_per_dispatch setting is measured in both transfer modes:
"exact" (dense f32 x + i32 labels, two implicit H2D transfers per
dispatch) and "packed" (ONE (S,B,N,10) u8 buffer per dispatch —
pack_batch — the TPU-default h2d mode; ~60 ms fixed tunnel latency per
transfer makes the single buffer matter as much as the 4x byte cut).

Usage:  python scripts/bench_train_loop.py [spd ...]   (default: 1 4 8)

Prints one JSON line per setting. Reference train inner loop:
/root/reference/train.py:616-631 (host-driven, one dispatch per step).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.parallel import (
    TrainState, jit_init, make_gfs_multi_train_step, make_gfs_optimizer,
    make_gfs_train_step, pack_batch)


def main():
    on_tpu = jax.default_backend() == "tpu"
    b, n = (16, 2048) if on_tpu else (2, 256)
    spds = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    steps = 48 if on_tpu else 8

    model = GWCAPL(classes=13, base_num=7, num_gw=150, main_dim=128,
                   use_pallas=on_tpu)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, 9))
    y0 = jax.random.randint(jax.random.PRNGKey(2), (b, n), 0, 8)
    gp = jax.random.normal(jax.random.PRNGKey(3), (150, 192))
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng}, x0, y0, gp, train=True)
    tx = make_gfs_optimizer(0.01, steps_per_epoch=100)

    host_rng = np.random.default_rng(7)
    # pre-generate host batches so generation cost is off the clock; copies
    # below make every device_put a genuine fresh H2D transfer
    xs = host_rng.standard_normal((steps, b, n, 9)).astype(np.float32)
    ys = host_rng.integers(0, 8, (steps, b, n)).astype(np.int32)

    for spd in spds:
        for packed in (False, True):
            state = TrainState.create(variables["params"],
                                      variables["batch_stats"], tx)
            if spd == 1:
                step = make_gfs_train_step(model, mesh=None, donate=False)

                def feed(i):
                    if packed:
                        buf = jax.device_put(pack_batch(xs[i], ys[i]))
                        return buf, buf
                    return xs[i].copy(), ys[i].copy()

                step(state, *feed(0), gp, rng)  # compile

                def run(step=step, feed=feed):
                    st, pending = state, []
                    for i in range(steps):
                        st, loss, _ = step(st, *feed(i), gp, rng)
                        pending.append(loss)
                        while len(pending) > 16:
                            float(pending.pop(0))
                    for l in pending:
                        float(l)
            else:
                mstep = make_gfs_multi_train_step(model, mesh=None,
                                                  donate=False)

                def feed(i, spd=spd):
                    if packed:
                        buf = jax.device_put(
                            pack_batch(xs[i:i + spd], ys[i:i + spd]))
                        return buf, buf
                    return xs[i:i + spd].copy(), ys[i:i + spd].copy()

                mstep(state, *feed(0), gp, rng)  # compile

                def run(spd=spd, mstep=mstep, feed=feed):
                    st, pending = state, []
                    for i in range(0, steps - steps % spd, spd):
                        st, losses, _ = mstep(st, *feed(i), gp, rng)
                        pending.append(losses)
                        while len(pending) > 2:
                            np.asarray(pending.pop(0))
                    for l in pending:
                        np.asarray(l)

            run()  # warmup (donation-free; state reused)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0)
            done = steps - steps % spd if spd > 1 else steps
            rate = done * b / min(times)
            mode = "packed" if packed else "exact"
            print(json.dumps({
                "metric": f"gfs_train_loop_spd{spd}_{mode}_"
                          "blocks_per_sec_per_chip",
                "value": round(rate, 2), "unit": "blocks/s/chip",
                "vs_baseline": round(rate / 600.0, 3)}))


if __name__ == "__main__":
    main()
