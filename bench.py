"""Throughput benchmark: 2048-point blocks/sec/chip on the GFS evaluation step.

Measures the flagship full-size GW/CAPL model's fused evaluation pass
(features -> GW coding -> transductive refine -> reweight -> argmax ->
confusion matrix) on synthetic fixed-shape batches — the BASELINE.json
north-star metric ("Full static_test_2048 query sweep"). Baseline target:
5,000 blocks/sec on a v5e-8 slice = 625 blocks/sec/chip.

Timing methodology: the eval step runs ITERS times inside one jitted
`lax.fori_loop` (accumulating the confusion matrix so nothing is dead code);
the wall clock is taken around a host transfer of the result, and two
different iteration counts are differenced to cancel the per-call dispatch/
tunnel overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def _stage(msg):
    """Cold-start liveness: staged progress on STDERR (the JSON result line
    stays alone on stdout) so a driver/CI harness with a timeout sees the
    first --sweep invocation making progress through fixture
    materialisation, packed-cache build and compile instead of recording
    nothing (round-3 verdict weak #2)."""
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Persist compiled TPU executables across bench invocations so a cold
    PROCESS is not a cold COMPILE. Best-effort: if the backend's PJRT
    plugin can't serialise executables JAX logs a warning and compiles as
    usual. TPU-backend only: with a cache dir set, XLA:CPU switches to its
    AOT pipeline, which compiles the same programs up to 65x slower
    (measured 390 s vs 5 s for the full-model init) and warns about
    machine-feature mismatches on load — host_init excludes its own CPU
    compile for the same reason (parallel/steps.py)."""
    if jax.default_backend() != "tpu":
        return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/gfs3d_jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

BASELINE_BLOCKS_PER_SEC_PER_CHIP = 5000.0 / 8.0
# train-step target set by the round-1 review (>600 blocks/s/chip at the
# reference batch (16, 2048)); the reference publishes no train throughput
TRAIN_REFERENCE_BLOCKS_PER_SEC = 600.0
# v5e chip peak (bf16 MXU); the roofline denominator for the MFU fields.
V5E_BF16_PEAK_TFLOPS = 197.0


def _attach_probe():
    """First device sync in its OWN stage. Through the axon tunnel a fresh
    process can block for minutes inside server attach/recovery whenever a
    previous TPU process exited recently (measured 250-550 s for a trivial
    150x192 fetch, round 5 — the same stall earlier rounds mis-attributed
    to the jit_init compile). Probing it here keeps the cost out of the
    init/compile attribution in the staged stderr log."""
    t0 = time.perf_counter()
    float(jnp.zeros((), jnp.float32) + 1.0)
    return time.perf_counter() - t0


def flops_per_block_eval(model, n: int) -> float:
    """Analytic MXU FLOPs for ONE n-point block through the fused GFS
    evaluation pass (2 FLOPs per MAC), term-by-term from the modules
    actually executed (models/dgcnn.py, models/attention.py,
    models/capl.py::evaluate). Counts matmul work only: the top-k
    extraction, gathers, softmaxes and max-over-K are comparison/byte
    bound, not FLOP bound (docs/ARCHITECTURE.md roofline section has the
    decomposition)."""
    k, mac = model.k, 0
    ec = [list(w) for w in model.edgeconv_widths]
    cins = [9] + [w[-1] for w in ec[:-1]]
    for cin, w in zip(cins, ec):
        mac += n * n * cin           # kNN pairwise-distance matmul (x x^T)
        mac += 2 * n * cin * w[0]    # decomposed layer-0 a/b point tables
        prev = w[0]
        for wi in w[1:]:             # remaining per-edge 1x1 convs
            mac += n * k * prev * wi
            prev = wi
    d_cat = sum(w[-1] for w in ec)                 # 192
    prev = d_cat
    for wi in model.mlp_widths:                    # [512, 256] point MLP
        mac += n * prev * wi
        prev = wi
    d_feat = model.mlp_widths[-1]                  # 256
    prev = d_feat
    for wi in model.base_widths:                   # base learner convs
        mac += n * prev * wi
        prev = wi
    od = model.output_dim                          # attention: QKV + 2 N^2
    mac += 3 * n * d_feat * od + 2 * n * n * od
    mac += n * d_cat * model.num_gw                # GW cosine match
    mac += n * (model.num_gw + d_cat) * model.main_dim   # fusion conv
    # prototype heads: refine pred + pred-proto aggregation + final pred,
    # plus the GW re-weighting score
    mac += 3 * n * model.main_dim * model.classes
    mac += n * model.num_gw * model.classes
    return 2.0 * mac


def _mfu_fields(model, npts: int, blocks_per_sec: float) -> dict:
    """Roofline tail for the bench JSON: achieved TFLOP/s and the fraction
    of v5e bf16 peak at the measured block rate."""
    fpb = flops_per_block_eval(model, npts)
    tflops = fpb * blocks_per_sec / 1e12
    return {
        "flops_per_block": round(fpb / 1e9, 3),          # GFLOPs
        "achieved_tflops": round(tflops, 2),
        "mfu_vs_bf16_peak": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
    }


def jit_init(model, rngs, *args, **kwargs):
    """model.init without paying per-process TPU compile
    (parallel/steps.py) — on accelerator backends the init executable
    compiles on the host CPU in ~5 s and the variables ship as one packed
    transfer (host_init); eager init would dispatch hundreds of tiny ops
    through the axon tunnel (measured 159 s at N=2048) and on-device
    compiled init cost 273-403 s/process (round-4 verdict weak #1)."""
    from gfs3dseg_gws_tpu.parallel.steps import jit_init as ji
    return ji(model, rngs, *args, **kwargs)


def bench_train():
    """Optional: `python bench.py --train` measures the TRAINING step
    (fwd+bwd+Adam) at the reference batch size.

    Same methodology as the eval bench: the step runs inside one jitted
    `lax.fori_loop` carrying the TrainState (so every iteration's update
    is live), and two iteration counts are differenced — the Python-loop
    alternative pays ~3 ms/step of axon-tunnel dispatch that a production
    host doesn't (measured 592 vs 675 blocks/s at (16, 2048), r3)."""
    import functools

    from gfs3dseg_gws_tpu.models.capl import GWCAPL
    from gfs3dseg_gws_tpu.parallel import (
        TrainState, make_gfs_optimizer, make_gfs_train_step)

    b, n = 16, 2048
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        b, n = 2, 256
    _stage(f"tunnel attach probe: {_attach_probe():.1f}s")
    model = GWCAPL(classes=13, base_num=7, num_gw=150, main_dim=128,
                   use_pallas=on_tpu)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, 9))
    y = jax.random.randint(jax.random.PRNGKey(2), (b, n), 0, 8)
    gp = jax.random.normal(jax.random.PRNGKey(3), (150, 192))
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng}, x, y, gp, train=True)
    tx = make_gfs_optimizer(0.01, steps_per_epoch=100)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = make_gfs_train_step(model, mesh=None, donate=False)
    state, loss, _ = step(state, x, y, gp, rng)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run(iters, st):
        def body(i, carry):
            st_, acc = carry
            st2, loss_, _ = step(st_, x + 0.0 * i, y, gp, rng)
            return st2, acc + loss_
        return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0.0)))

    def timed(iters):
        t0 = time.perf_counter()
        _, acc = run(iters, state)
        float(acc)  # host transfer = true synchronization
        return time.perf_counter() - t0

    timed(1)  # compile + warmup
    lo, hi = (2, 12) if on_tpu else (1, 3)
    t_lo = min(timed(lo) for _ in range(3))
    t_hi = min(timed(hi) for _ in range(3))
    dt = (t_hi - t_lo) / (hi - lo)
    print(json.dumps({
        "metric": "gfs_train_2048pt_blocks_per_sec_per_chip",
        "value": round(b / dt, 2),
        "unit": "blocks/s/chip",
        "vs_baseline": round((b / dt) / TRAIN_REFERENCE_BLOCKS_PER_SEC, 3),
    }))


def bench_sweep():
    """`python bench.py --sweep` measures the REAL static_test sweep
    END-TO-END — on-disk fixture -> packed memmap batches -> jitted eval
    steps -> confusion matrix -> GFS metric — i.e. validate() exactly as
    only_evaluate runs it (reference train.py:666-731), host I/O included.

    The synthetic fixture (1024 blocks x 2048 pts) is materialised once
    under /tmp and reused across invocations.

    Round-3 evolution of this number on the axon-tunnelled v5e chip
    (1024 blocks): r2 ended at 320 b/s, bound by H2D at 72 KB/block f32
    through the ~40 MB/s tunnel. Packed H2D (xyz f16 + rgb u8 + label u8,
    device-side unpack — 20 KB/block) lifted it to ~508, at which point
    per-step dispatch latency dominated (the r2 note measured ~936 b/s
    dispatch-bound even device-resident at bs=64); bs=256 cuts the sweep
    to 4 dispatches: 497/806/1071 b/s at bs 64/128/256. The 5-seed
    only_evaluate flow amortises each transferred batch over 5 prototype
    sets (evaluate_multi), so its per-seed e2e rate is higher still.

    Round 4: the repeated sweeps model PERIODIC validation during
    training (train.py:518-544 re-runs the identical static_test sweep
    every eval_interval epochs), so the bench passes the same per-run
    `device_cache` train_gfs uses: the warmup sweep pays the one-time
    H2D fill (packed static_test = 20 KB/block pinned in HBM, bounded by
    GFS3D_DEVICE_CACHE_MB) and the timed sweeps measure the steady-state
    validation rate with no host link on the path — which is what every
    validation after the first costs in a real run. Set
    GFS3D_NO_DEVICE_CACHE=1 to measure the old streaming (first-sweep)
    rate instead; both readings are recorded in BENCH_LOCAL_r04.json."""
    import os

    from gfs3dseg_gws_tpu.data import make_synthetic_blocks
    from gfs3dseg_gws_tpu.data.datasets import TestingDataset
    from gfs3dseg_gws_tpu.data.registry import DatasetRegistry
    from gfs3dseg_gws_tpu.models.capl import GWCAPL
    from gfs3dseg_gws_tpu.pipelines.gfs import validate

    on_tpu = jax.default_backend() == "tpu"
    npts = 2048 if on_tpu else 256
    n_blocks = 1024 if on_tpu else 16
    batch = 256 if on_tpu else 4

    _stage(f"tunnel attach probe: {_attach_probe():.1f}s (first device "
           "sync; minutes here = axon server recovery, not this process)")
    root = f"/tmp/gfs3d_bench_sweep_n{npts}_m{n_blocks}"
    test_dir = os.path.join(root, "blocks_bs1.0_s1.0_test")
    if not os.path.isdir(test_dir):
        _stage(f"materialising {n_blocks}-block synthetic fixture (cold, "
               f"one-time)")
        make_synthetic_blocks(root, n_train_blocks=2, n_test_blocks=n_blocks,
                              points_per_block=npts + npts // 2, seed=9)
    _stage("building dataset registry")
    reg = DatasetRegistry("s3dis", 0, test_dir)
    order = sorted(reg.train_classes) + sorted(reg.test_classes)
    names = sorted(order)
    ds = TestingDataset(test_dir, names, order,
                        {c: reg.class2scans[c] for c in names},
                        num_point=npts)

    model = GWCAPL(classes=13, base_num=7, num_gw=150, main_dim=128,
                   use_pallas=on_tpu)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, npts, 9))
    y0 = jnp.zeros((2, npts), jnp.int32)
    gp = jax.random.normal(jax.random.PRNGKey(3), (150, 192))
    _stage("jit_init full model")
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng}, x0, y0, gp, train=True)
    gened = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (13, 128)))
    base_coding = np.ones((7, 150), np.float32)
    novel_coding = np.ones((6, 150), np.float32)

    eval_cache = {}   # per-run device-resident static_test (as train_gfs)

    def sweep():
        return validate(model, variables, gp, ds, gened, base_coding,
                        novel_coding, order, sorted(reg.test_classes), 13,
                        batch_size=batch, device_cache=eval_cache)

    _stage("warmup sweep (eval-step compile + packed memmap cache build)")
    sweep()  # compile + packed-cache build
    _stage("warm; timing 3 cached sweeps")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sweep()
        times.append(time.perf_counter() - t0)
    # the FIRST sweep of a run (and --only_evaluate's one-shot sweep)
    # streams over the host link instead of the device cache — report it
    # alongside so the cached headline stays comparable (r4 advisor)
    _stage("timing 2 streaming sweeps (no device cache)")
    stream_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        validate(model, variables, gp, ds, gened, base_coding, novel_coding,
                 order, sorted(reg.test_classes), 13, batch_size=batch)
        stream_times.append(time.perf_counter() - t0)
    _stage("done")
    blocks_per_sec = len(ds) / min(times)
    streaming = len(ds) / min(stream_times)
    print(json.dumps({
        "metric": "gfs_eval_sweep_e2e_blocks_per_sec_per_chip",
        "value": round(blocks_per_sec, 2),
        "unit": "blocks/s/chip",
        "vs_baseline": round(
            blocks_per_sec / BASELINE_BLOCKS_PER_SEC_PER_CHIP, 3),
        # the headline models PERIODIC validation: the static_test set is
        # pinned in HBM after the first sweep (device_cache), so the host
        # link is not on the timed path — flagged explicitly, with the
        # streaming (first-sweep / only_evaluate) rate alongside
        "device_cached": True,
        "streaming_blocks_per_sec": round(streaming, 2),
        **_mfu_fields(model, npts, blocks_per_sec),
    }))


def main():
    from gfs3dseg_gws_tpu.models.capl import GWCAPL
    from gfs3dseg_gws_tpu.ops.metrics import confusion_matrix

    on_tpu = jax.default_backend() == "tpu"
    batch = 64 if on_tpu else 4
    npts = 2048
    _stage(f"tunnel attach probe: {_attach_probe():.1f}s")
    model = GWCAPL(classes=13, base_num=7, num_gw=150, main_dim=128,
                   use_pallas=on_tpu)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, npts, 9))
    y = jax.random.randint(jax.random.PRNGKey(2), (batch, npts), 0, 13)
    gp = jax.random.normal(jax.random.PRNGKey(3), (150, 192))
    variables = jit_init(model, {"params": rng, "dropout": rng,
                                 "fake": rng}, x, y, gp, train=True)
    gened = jax.random.normal(jax.random.PRNGKey(4), (13, 128))
    base_coding = jnp.ones((7, 150))
    novel_coding = jnp.ones((6, 150))

    def eval_once(points):
        logits, _, _ = model.apply(variables, points, gp, gened, base_coding,
                                   novel_coding, method="evaluate")
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, y, 13)

    @jax.jit
    def run(points, iters):
        def body(i, cm):
            # fold the iteration index in so no iteration is removable
            return cm + eval_once(points + 0.0 * i)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((13, 13)))

    def timed(iters):
        t0 = time.perf_counter()
        cm = run(x, jnp.int32(iters))
        float(cm.sum())  # host transfer = true synchronization
        return time.perf_counter() - t0

    timed(1)  # compile + warmup
    lo, hi = (2, 12) if on_tpu else (1, 3)
    t_lo = min(timed(lo) for _ in range(3))
    t_hi = min(timed(hi) for _ in range(3))
    dt_per_iter = (t_hi - t_lo) / (hi - lo)

    blocks_per_sec = batch / dt_per_iter
    print(json.dumps({
        "metric": "gfs_eval_2048pt_blocks_per_sec_per_chip",
        "value": round(blocks_per_sec, 2),
        "unit": "blocks/s/chip",
        "vs_baseline": round(blocks_per_sec / BASELINE_BLOCKS_PER_SEC_PER_CHIP,
                             3),
        **_mfu_fields(model, npts, blocks_per_sec),
    }))


if __name__ == "__main__":
    _enable_compile_cache()
    if "--train" in sys.argv:
        bench_train()
    elif "--sweep" in sys.argv:
        bench_sweep()
    else:
        main()
