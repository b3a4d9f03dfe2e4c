"""Compiled SPMD train/eval steps.

Each factory returns one jitted function with explicit shardings: the batch is
sharded over the mesh's `data` axis, everything else replicated. GSPMD inserts
the gradient all-reduce and the cross-device reductions hidden inside
BatchNorm / fake-prototype means / confusion matrices.

The GFS evaluation step is the BASELINE.json "single XLA-compiled eval step":
features -> GW coding -> transductive refine -> reweight -> argmax ->
confusion-matrix update, with only (C, C) counts leaving the device.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gfs3dseg_gws_tpu.ops.metrics import confusion_matrix


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def _shardings(mesh: Optional[Mesh]):
    """(batch, replicated) shardings; on a `data x points` mesh the batch
    sharding also splits the point axis (dim 1 of every (B, N, ...) step
    input — points, labels, packed buffers)."""
    if mesh is None:
        return None, None
    if "points" in mesh.axis_names:
        return (NamedSharding(mesh, P("data", "points")),
                NamedSharding(mesh, P()))
    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P())


def _split_static_bools(args, kwargs):
    """(init_fn_builder helper) python-bool positionals are train flags and
    must stay static so `if train:` branches in modules stay concrete."""
    assert all(isinstance(v, bool) for v in kwargs.values()), (
        "init kwargs must be static bools (train flags); pass arrays "
        f"positionally: {kwargs}")
    static = {i: a for i, a in enumerate(args) if isinstance(a, bool)}
    dyn = [a for i, a in enumerate(args) if i not in static]
    return static, dyn


def device_put_packed(tree, device=None):
    """Ship a host pytree to the device as ONE transfer per dtype.

    Every H2D transfer through the axon tunnel pays ~60 ms fixed latency
    regardless of size (scripts/bench_train_loop.py); a full-model variables
    tree is ~63 leaves / 1.6 MB, so per-leaf `jax.device_put` costs ~60×
    the wire time. Pack each dtype group into one flat buffer, transfer
    once, and slice the leaves back out in ONE tiny jitted program (eager
    per-leaf slicing would re-pay per-op dispatch)."""
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    np_leaves = [np.asarray(l) for l in leaves]
    groups: dict = {}
    for i, leaf in enumerate(np_leaves):
        groups.setdefault(leaf.dtype.str, []).append(i)
    keys = sorted(groups)
    dev_bufs = {
        k: jax.device_put(
            np.concatenate([np_leaves[i].ravel() for i in groups[k]]),
            device)
        for k in keys
    }
    sizes = [l.size for l in np_leaves]
    shapes = [l.shape for l in np_leaves]

    def unpack(bufs):
        out = [None] * len(np_leaves)
        for k in keys:
            off = 0
            for i in groups[k]:
                out[i] = jax.lax.slice_in_dim(
                    bufs[k], off, off + sizes[i]).reshape(shapes[i])
                off += sizes[i]
        return out

    out_leaves = jax.jit(unpack)(dev_bufs)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def host_init(model, rngs, *args, **kwargs):
    """model.init on the host CPU backend + one packed H2D transfer.

    Init is shape math: parameter values depend only on the RNG and the
    param shapes, never on the accelerator, the input values, or the
    Pallas-vs-XLA compute path (pinned by
    tests/test_parallel.py::test_host_init_matches_device_init). Compiling
    the full GWCAPL init executable on the tunnelled TPU cost 273-403 s
    per PROCESS (round-4 verdict weak #1 — the persistent compile cache
    does not serve it on this platform); the same init compiles on the
    host CPU in ~5 s, and the resulting ~1.6 MB variables tree ships as
    one packed buffer (`device_put_packed`). The TPU then only ever
    compiles the train/eval steps. Models with a `use_pallas` flag are
    cloned to the XLA fallback for the CPU trace (Mosaic kernels don't
    lower on CPU); this cannot change the produced params.

    Cross-backend bit-exactness caveat (measured on the v5e,
    scripts/check_host_init.py): the threefry random BITS are
    platform-invariant, but the TPU's erfinv rounds the uniform->normal
    transform differently, so normal-drawn leaves agree with an on-device
    init to ~2.2e-5 rather than bitwise — distribution-identical draws
    from the same bits, immaterial for a random init (checkpoint restore
    bypasses init values entirely). The TPU gate bounds it at 1e-4."""
    static, dyn = _split_static_bools(args, kwargs)
    m = model
    if getattr(model, "use_pallas", False):
        m = model.clone(use_pallas=False)

    def init(r, *d):
        it = iter(d)
        full = [static[i] if i in static else next(it)
                for i in range(len(args))]
        return m.init(r, *full, **kwargs)

    cpu = jax.devices("cpu")[0]
    import numpy as np

    # host copies of the exemplars: an uncommitted TPU-backed exemplar
    # would otherwise be fetched D2H inside the CPU jit
    host = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, (rngs, dyn))
    # the persistent compile cache must NOT see this compile: with a cache
    # dir set, XLA:CPU switches to its AOT pipeline for serialisability and
    # the full-model init compile balloons from ~5 s to ~390 s (measured on
    # the v5e host; the stored artifact then warns about machine-feature
    # mismatch on every load). The init runs once per process — there is
    # nothing worth caching.
    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    if cache_dir is not None:
        jax.config.update("jax_compilation_cache_dir", None)
    try:
        with jax.default_device(cpu):
            variables = jax.jit(init)(host[0], *host[1])
    finally:
        if cache_dir is not None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
    if jax.default_backend() == "cpu":
        return variables
    return device_put_packed(jax.device_get(variables))


def jit_init(model, rngs, *args, **kwargs):
    """model.init without eager per-op dispatch, placed on the default
    backend.

    Eager init dispatches hundreds of tiny ops one by one; through the axon
    tunnel that costs minutes (measured 159s for the full GWCAPL at N=2048).
    Compiled-on-TPU init is worse still at full model size: 273-403 s of
    compile per process that the persistent cache does not serve (round-4
    verdict). So on accelerator backends this routes to `host_init` — the
    init executable compiles on the host CPU in seconds and only the
    finished variables tree crosses the tunnel. Set GFS3D_DEVICE_INIT=1 to
    force the old on-device compile (A/B measurement). kwargs and
    python-bool positionals (train flags) are kept static so `if train:`
    branches in modules stay concrete; kwargs are restricted to bools (an
    array kwarg would be baked into the compiled program as a constant).
    Builds a fresh jit per call by design — init runs once per process;
    repeated jitted steps belong in cached_step."""
    from gfs3dseg_gws_tpu.utils.env import env_flag

    if jax.default_backend() != "cpu" and not env_flag("GFS3D_DEVICE_INIT"):
        return host_init(model, rngs, *args, **kwargs)
    static, dyn = _split_static_bools(args, kwargs)

    def init(r, *d):
        it = iter(d)
        full = [static[i] if i in static else next(it)
                for i in range(len(args))]
        return model.init(r, *full, **kwargs)

    return jax.jit(init)(rngs, *dyn)


_STEP_CACHE: dict = {}


def cached_step(factory, *key_args, **factory_kwargs):
    """Memoise jitted step functions.

    jax.jit caches on the identity of the wrapped Python function, so
    re-invoking a make_*_step factory per epoch/validation would recompile
    every time; pipelines route through this cache instead. Keys must be
    hashable (model/mesh instances are fine)."""
    key = (factory.__name__, key_args, tuple(sorted(factory_kwargs.items())))
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = factory(*key_args, **factory_kwargs)
    return _STEP_CACHE[key]


def _gfs_step_body(model) -> Callable:
    """Shared single-step body for the GFS train-step factories."""

    def step(state: TrainState, points, labels, gp, rng):
        points = unpack_points(points)   # no-op on dense f32 batches
        labels = unpack_labels(labels)
        r_drop, r_fake = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            (pred, loss), upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, labels, gp, True,
                rngs={"dropout": r_drop, "fake": r_fake},
                mutable=["batch_stats"])
            return loss, (pred, upd["batch_stats"])

        (loss, (pred, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        accuracy = jnp.mean((pred == labels).astype(jnp.float32))
        return new_state, loss, accuracy

    return step


def make_gfs_train_step(model, mesh: Optional[Mesh] = None,
                        donate: bool = True) -> Callable:
    """GFS base-stage train step (reference train.py:616-631 inner loop).

    signature: (state, points (B,N,C), labels (B,N), gp, rng) ->
               (state, loss, accuracy)
    """
    step = _gfs_step_body(model)
    data_s, rep_s = _shardings(mesh)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    return jax.jit(
        step,
        in_shardings=(rep_s, data_s, data_s, rep_s, rep_s),
        out_shardings=(rep_s, rep_s, rep_s),
        donate_argnums=(0,) if donate else (),
    )


def make_gfs_multi_train_step(model, mesh: Optional[Mesh] = None,
                              donate: bool = True) -> Callable:
    """S chained GFS train steps in ONE dispatch (lax.scan over the batch
    stack) — bit-identical to S sequential `make_gfs_train_step` calls.

    signature: (state, points (S,B,N,C), labels (S,B,N), gp, rng) ->
               (state, losses (S,), accuracies (S,))

    Exactness: the single-step body derives its dropout/fake streams by
    folding `rng` with `state.step`, and `apply_gradients` bumps `step`
    once per scan iteration — so the scan replays the identical RNG/update
    sequence the python loop would (pinned by
    tests/test_parallel.py::test_multi_train_step_matches_sequential).

    Why: each dispatch through the axon tunnel costs ~3 ms of launch
    latency; at 24 ms/step that is the measured 588 -> 675 blocks/s/chip
    gap between python-loop and device rate (docs/ARCHITECTURE.md,
    train-step accounting). Chunking S steps per dispatch amortises it to
    3/S ms without touching step semantics. The reference has no
    counterpart (its torch loop is host-driven per step, train.py:616).
    """
    step = _gfs_step_body(model)

    def multi(state: TrainState, points, labels, gp, rng):
        def body(st, batch):
            p, l = batch
            st, loss, acc = step(st, p, l, gp, rng)
            return st, (loss, acc)

        state, (losses, accs) = jax.lax.scan(body, state, (points, labels))
        return state, losses, accs

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0,) if donate else ())
    rep_s = NamedSharding(mesh, P())
    stack_s = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        multi,
        in_shardings=(rep_s, stack_s, stack_s, rep_s, rep_s),
        out_shardings=(rep_s, rep_s, rep_s),
        donate_argnums=(0,) if donate else (),
    )


PACKED_POINT_BYTES = 10   # xyz f16 (6) | rgb u8 (3) | label u8 (1)


def pack_quantized_parts(xyz16, rgb8, labels):
    """Assemble the (…, N, 10) u8 wire buffer from pre-quantised parts.

    Single owner of the packed byte layout (xyz f16 LE bytes 0:6 | rgb u8
    6:9 | label u8 9) shared by `pack_batch` (host f32 batches) and the
    packed static_test sweep (`pipelines/gfs.py::eval_batches`, which reads
    the parts straight from the f16/u8 memmap cache).  `unpack_points` /
    `unpack_labels` are the device-side decoders of this exact layout.
    """
    import numpy as np

    xyz16 = np.asarray(xyz16, np.float16)
    buf = np.empty(xyz16.shape[:-1] + (PACKED_POINT_BYTES,), np.uint8)
    buf[..., 0:6] = np.ascontiguousarray(xyz16).view(np.uint8).reshape(
        xyz16.shape[:-1] + (6,))
    buf[..., 6:9] = rgb8
    buf[..., 9] = labels
    return buf


def _native_pack(pts, labels):
    """One-pass C encoder for the pack_batch wire buffer, or None when the
    numpy path must run instead.

    The numpy path makes four full-array passes at the spd8 production
    chunk (astype f16, isinf/isfinite guards, rgb rint, byte assembly) —
    measured 18.5 ms on the 1-core TPU host, none of which hides behind
    device compute (docs/ARCHITECTURE.md, host-fed attribution). The fused
    C pass (native/blockloader.cc::bl_pack) is byte-identical and 5.0 ms.
    Native handles only the hot exact case: float32 input (anything else
    would double-round f64->f32->f16) with labels of matching shape; the
    guard ValueErrors carry the same messages, so make_batch_putter's
    fallback-to-exact behaviour is unchanged. GFS3D_NO_NATIVE=1 disables.
    """
    import os

    import numpy as np

    if pts.dtype != np.float32 or os.environ.get("GFS3D_NO_NATIVE"):
        return None
    if labels is not None:
        lbl = np.asarray(labels)
        if lbl.shape != pts.shape[:-1]:
            return None          # numpy path broadcasts/raises as before
        lbl64 = np.ascontiguousarray(lbl, np.int64).reshape(-1)
    else:
        lbl = lbl64 = None
    from gfs3dseg_gws_tpu.data import native_loader as nl

    if not nl.pack_available():
        return None
    flat = np.ascontiguousarray(pts).reshape(-1, 9)
    out = np.empty(pts.shape[:-1] + (PACKED_POINT_BYTES,), np.uint8)
    rc = nl.pack(flat, lbl64, out.reshape(-1, PACKED_POINT_BYTES))
    if rc == 1:
        raise ValueError(
            "pack_batch: coordinates overflow float16; use h2d='exact' "
            "(or GFS3D_EXACT_H2D=1) for this dataset")
    if rc == 2:
        raise ValueError(
            f"pack_batch labels outside the u8 range "
            f"[{lbl.min()}, {lbl.max()}]; use h2d='exact' for datasets "
            "with negative/large ignore labels")
    return out


@functools.lru_cache(maxsize=64)
def cached_int32(value: int):
    """Per-process cache of tiny device scalars (batch `valid` counts).

    A fresh `jnp.int32(v)` per eval dispatch is its own H2D transfer, and
    every transfer through the axon tunnel pays a fixed latency regardless
    of size (scripts/bench_train_loop.py); `valid` repeats every sweep
    (== batch_size for all but the final batch), so the cache removes one
    transfer per batch."""
    return jnp.int32(value)


def pack_batch(points, labels=None):
    """Host-side: (..., N, 9) f32 xyzrgbXYZ (+ labels) -> ONE contiguous
    (..., N, 10) uint8 transfer buffer.

    Byte layout per point: xyz as little-endian f16 (6) | rgb as u8 (3) |
    label as u8 (1).  XYZ is NOT shipped: the native loader computes it
    post-augmentation as (xyz - min) / span (native/blockloader.cc:262-275,
    mirroring reference dataloaders/loader.py:92-101), which
    `unpack_points` reproduces on device.  rgb recovers the original uint8
    exactly (the samplers emit orig/255).  One buffer instead of separate
    arrays because each transfer through the axon tunnel pays ~60 ms fixed
    latency regardless of size (measured, scripts/bench_train_loop.py).
    """
    import numpy as np

    pts = np.asarray(points)
    if pts.shape[-1] != 9:
        # the layout assumes the reference's full xyzrgbXYZ attribute set
        # (dataloaders/loader.py:97-101); reduced --pc_attribs must ship
        # dense (make_batch_putter falls back to the exact path on this)
        raise ValueError(
            f"pack_batch requires 9-feature xyzrgbXYZ points, got "
            f"{pts.shape[-1]}; use h2d='exact' for other --pc_attribs")
    native = _native_pack(pts, labels)
    if native is not None:
        return native
    xyz16 = np.ascontiguousarray(pts[..., 0:3].astype(np.float16))
    if np.isinf(xyz16).any() and np.isfinite(pts[..., 0:3]).all():
        # room-scale block coords always fit f16 (|x| <= 65504); a dataset
        # with huge absolute coordinates (UTM offsets, mm units) cannot use
        # the packed wire format — raise so make_batch_putter drops to the
        # exact path permanently (shipping inf would NaN the loss after one
        # easily-missed warning)
        raise ValueError(
            "pack_batch: coordinates overflow float16; use h2d='exact' "
            "(or GFS3D_EXACT_H2D=1) for this dataset")
    if labels is None:
        lbl = 0
    else:
        lbl = np.asarray(labels)
        if lbl.min() < 0 or lbl.max() > 255:
            # the label byte is u8; a negative ignore label (-1/-100) would
            # silently wrap to a valid-looking class id after the device
            # upcast — fail loudly instead (the putter falls back to exact)
            raise ValueError(
                f"pack_batch labels outside the u8 range "
                f"[{lbl.min()}, {lbl.max()}]; use h2d='exact' for datasets "
                "with negative/large ignore labels")
    rgb8 = np.clip(np.rint(pts[..., 3:6] * 255.0), 0, 255)
    return pack_quantized_parts(xyz16, rgb8, lbl)


def unpack_points(points):
    """Reconstruct (B, N, 9) xyzrgbXYZ features from a packed H2D payload.

    `points` is either the dense f32 array (exact path) or the single
    (B, N, 10) uint8 buffer from `pack_quantized_parts`/`pack_batch`
    (labels ride in byte 9 and are read by `unpack_labels`).
    9-10 bytes/point instead of 36-40 — a ~4x cut of the host->device
    transfer that bounds the end-to-end sweep and host-fed train loop
    through the axon tunnel (~40 MB/s + ~60 ms/transfer).  The normalised
    XYZ attributes are recomputed on device exactly as the samplers do
    host-side post-augmentation (reference dataloaders/loader.py:92-101,
    native/blockloader.cc:262-275).  Documented deviation of the packed
    path: coords quantised to f16 (<=2^-11 relative) and XYZ/rgb recomputed
    in f32 device arithmetic; use h2d="exact" for strict parity.
    """
    if points.dtype == jnp.uint8:
        pairs = points[..., 0:6].reshape(points.shape[:-1] + (3, 2))
        xyz = jax.lax.bitcast_convert_type(pairs, jnp.float16
                                           ).astype(jnp.float32)
        rgb = points[..., 6:9].astype(jnp.float32) / 255.0
    else:
        return points
    # axis=-2 is the point axis (N): (B,N,3) batches and 4-D episodic
    # layouts like (n_way,k_shot,N,3) both normalise per sampled cloud
    shifted = xyz - jnp.min(xyz, axis=-2, keepdims=True)
    span = jnp.max(shifted, axis=-2, keepdims=True)
    # degenerate axis (coplanar block / f16-collapsed span): match the
    # native loader's span<=0 -> 1.0 guard (blockloader.cc:272) instead
    # of emitting 0/0 = NaN features
    span = jnp.where(span <= 0.0, 1.0, span)
    return jnp.concatenate([xyz, rgb, shifted / span], axis=-1)


def unpack_labels(labels):
    """Labels from either transfer form: dense int (B,N), or the
    (B, N, 10) u8 `pack_batch` buffer (byte 9) — callers in single-buffer
    mode pass the SAME device buffer as both the points and labels
    argument, so only one H2D transfer happens."""
    if labels.dtype == jnp.uint8 and labels.ndim >= 3 \
            and labels.shape[-1] == PACKED_POINT_BYTES:
        return labels[..., 9].astype(jnp.int32)
    return labels.astype(jnp.int32)


def make_gfs_eval_step(model, num_classes: int,
                       mesh: Optional[Mesh] = None,
                       packed_out: bool = False) -> Callable:
    """Fused GFS eval step: logits + argmax + confusion matrix on device.

    signature: (variables, points, labels, gp, gened_proto, base_coding,
                novel_coding) -> (cm (C,C), gp_acc, gp_novel_acc)

    packed_out=True concatenates the outputs into ONE f32 vector
    (cm.ravel() | gp_acc | gp_novel_acc), shape (C*C + 2,) — every
    fetched device array is a separate D2H transfer through the axon
    tunnel with its own fixed latency, and the three tiny results cost
    ~16 ms/batch of sweep tail (measured, scripts/probe_sweep_tail.py:
    1,533 -> 1,698 blocks/s on the cached sweep from this packing alone).
    All values are exact in f32 (cm counts < 2^24 per batch).
    """

    def step(variables, points, labels, gp, gened_proto, base_coding,
             novel_coding, valid):
        points = unpack_points(points)
        labels = unpack_labels(labels)   # u8 / buffer in packed-H2D mode
        logits, gp_acc, gp_nacc = model.apply(
            variables, points, gp, gened_proto, base_coding, novel_coding,
            labels, valid, method="evaluate")
        pred = jnp.argmax(logits, axis=-1)
        row_ok = (jnp.arange(points.shape[0]) < valid)
        mask = jnp.broadcast_to(row_ok[:, None], labels.shape)
        cm = confusion_matrix(pred, labels, num_classes, mask)
        if packed_out:
            return jnp.concatenate([
                cm.reshape(-1).astype(jnp.float32),
                gp_acc.reshape(1).astype(jnp.float32),
                gp_nacc.reshape(1).astype(jnp.float32)])
        return cm, gp_acc, gp_nacc

    data_s, rep_s = _shardings(mesh)
    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(rep_s, data_s, data_s, rep_s, rep_s, rep_s, rep_s,
                      rep_s),
        out_shardings=rep_s if packed_out else (rep_s, rep_s, rep_s),
    )


def make_gfs_eval_multi_step(model, num_classes: int,
                             mesh: Optional[Mesh] = None,
                             packed_out: bool = False) -> Callable:
    """Multi-seed GFS eval: S prototype sets share one feature sweep
    (GWCAPL.evaluate_multi). Returns per-seed confusion matrices.

    signature: (variables, points, labels, gp, gened_protos (S,cls,C),
                base_coding, novel_codings (S,n_novel,K), valid) ->
               (cm (S,C,C), gp_acc (S,), gp_novel_acc (S,))

    packed_out=True returns ONE (S, C*C + 2) f32 array instead (per-seed
    rows: cm.ravel() | gp_acc | gp_novel_acc) — one D2H transfer per
    batch instead of three (see make_gfs_eval_step).
    """

    def step(variables, points, labels, gp, gened_protos, base_coding,
             novel_codings, valid):
        points = unpack_points(points)
        labels = unpack_labels(labels)   # u8 / buffer in packed-H2D mode
        logits, gp_acc, gp_nacc = model.apply(
            variables, points, gp, gened_protos, base_coding, novel_codings,
            labels, valid, method="evaluate_multi")   # (S, B, N, cls)
        pred = jnp.argmax(logits, axis=-1)            # (S, B, N)
        row_ok = (jnp.arange(points.shape[0]) < valid)
        mask = jnp.broadcast_to(row_ok[:, None], labels.shape)
        cm = jax.vmap(lambda p: confusion_matrix(p, labels, num_classes,
                                                 mask))(pred)
        if packed_out:
            s = cm.shape[0]
            return jnp.concatenate([
                cm.reshape(s, -1).astype(jnp.float32),
                gp_acc.reshape(s, 1).astype(jnp.float32),
                gp_nacc.reshape(s, 1).astype(jnp.float32)], axis=1)
        return cm, gp_acc, gp_nacc

    data_s, rep_s = _shardings(mesh)
    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(rep_s, data_s, data_s, rep_s, rep_s, rep_s, rep_s,
                      rep_s),
        out_shardings=rep_s if packed_out else (rep_s, rep_s, rep_s),
    )


def make_gfs_eval_scan_step(model, num_classes: int,
                            mesh: Optional[Mesh] = None,
                            multi: bool = False) -> Callable:
    """The WHOLE cached validation sweep in ONE dispatch: `lax.scan` over
    the device-pinned batch stack.

    signature: (variables, points (S,B,N,Cin|10), labels (same or ==points
                in single-buffer packed mode), gp, gened, base_coding,
                novel_coding(s), valids (S,)) -> (S, [seeds,] C*C+2) f32

    The per-batch eval path costs one dispatch + one tiny D2H per batch
    (~3 ms launch + fixed-latency fetch through the axon tunnel); at
    bs=256 that is 4 of each per 1,024-block sweep — the measured
    1,713-vs-1,838 blocks/s gap between the cached e2e sweep and the pure
    device rate. Scanning over the stacked batches collapses the sweep to
    ONE dispatch and ONE (S, C*C+2) fetch. Identical numerics: the scan
    body IS the packed_out step body (same model.apply, same confusion
    matrix, same valid masking) — pinned metric-identical by the
    device-cache tests."""
    def single(variables, points, labels, gp, gened, base_coding,
               novel_coding, valid):
        points = unpack_points(points)
        labels = unpack_labels(labels)
        if multi:
            logits, gp_acc, gp_nacc = model.apply(
                variables, points, gp, gened, base_coding, novel_coding,
                labels, valid, method="evaluate_multi")     # (S,B,N,cls)
            pred = jnp.argmax(logits, axis=-1)
            row_ok = (jnp.arange(points.shape[0]) < valid)
            mask = jnp.broadcast_to(row_ok[:, None], labels.shape)
            cm = jax.vmap(lambda p: confusion_matrix(
                p, labels, num_classes, mask))(pred)
            s = cm.shape[0]
            return jnp.concatenate([
                cm.reshape(s, -1).astype(jnp.float32),
                gp_acc.reshape(s, 1).astype(jnp.float32),
                gp_nacc.reshape(s, 1).astype(jnp.float32)], axis=1)
        logits, gp_acc, gp_nacc = model.apply(
            variables, points, gp, gened, base_coding, novel_coding,
            labels, valid, method="evaluate")
        pred = jnp.argmax(logits, axis=-1)
        row_ok = (jnp.arange(points.shape[0]) < valid)
        mask = jnp.broadcast_to(row_ok[:, None], labels.shape)
        cm = confusion_matrix(pred, labels, num_classes, mask)
        return jnp.concatenate([
            cm.reshape(-1).astype(jnp.float32),
            gp_acc.reshape(1).astype(jnp.float32),
            gp_nacc.reshape(1).astype(jnp.float32)])

    def sweep(variables, points, labels, gp, gened, base_coding,
              novel_coding, valids):
        # in single-buffer packed mode the caller passes the SAME stacked
        # u8 buffer as both points and labels; unpack_labels reads byte 9

        def body(_, batch):
            p, l, v = batch
            return None, single(variables, p, l, gp, gened, base_coding,
                                novel_coding, v)

        _, rows = jax.lax.scan(body, None, (points, labels, valids))
        return rows                                  # (S, ...)

    if mesh is None:
        return jax.jit(sweep)
    if "points" in mesh.axis_names:
        stack_s = NamedSharding(mesh, P(None, "data", "points"))
    else:
        stack_s = NamedSharding(mesh, P(None, "data"))
    rep_s = NamedSharding(mesh, P())
    return jax.jit(sweep,
                   in_shardings=(rep_s, stack_s, stack_s, rep_s, rep_s,
                                 rep_s, rep_s, rep_s),
                   out_shardings=rep_s)


def _pretrain_step_body(model) -> Callable:
    """Shared single-step body for the pretrain-step factories."""
    from gfs3dseg_gws_tpu.models.layers import cross_entropy

    def step(state: TrainState, points, labels, rng):
        points = unpack_points(points)   # no-op on dense f32 batches
        labels = unpack_labels(labels)
        r = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, True, rngs={"dropout": r}, mutable=["batch_stats"])
            return cross_entropy(logits, labels), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_bs), loss

    return step


def make_pretrain_step(model, mesh: Optional[Mesh] = None,
                       donate: bool = True) -> Callable:
    """Supervised segmentation train step (reference pretrain pre_train.py:144-159).

    signature: (state, points, labels, rng) -> (state, loss)
    """
    step = _pretrain_step_body(model)
    data_s, rep_s = _shardings(mesh)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    return jax.jit(
        step,
        in_shardings=(rep_s, data_s, data_s, rep_s),
        out_shardings=(rep_s, rep_s),
        donate_argnums=(0,) if donate else (),
    )


def make_pretrain_multi_step(model, mesh: Optional[Mesh] = None,
                             donate: bool = True) -> Callable:
    """S chained pretrain steps in ONE dispatch — same lax.scan scheme and
    exactness argument as `make_gfs_multi_train_step` (the dropout stream
    folds on `state.step`, which the scan bumps per iteration).

    signature: (state, points (S,B,N,C), labels (S,B,N), rng) ->
               (state, losses (S,))
    """
    step = _pretrain_step_body(model)

    def multi(state: TrainState, points, labels, rng):
        def body(st, batch):
            p, l = batch
            st, loss = step(st, p, l, rng)
            return st, loss

        state, losses = jax.lax.scan(body, state, (points, labels))
        return state, losses

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0,) if donate else ())
    rep_s = NamedSharding(mesh, P())
    stack_s = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        multi,
        in_shardings=(rep_s, stack_s, stack_s, rep_s),
        out_shardings=(rep_s, rep_s),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_logits_step(model, num_classes: int,
                          mesh: Optional[Mesh] = None) -> Callable:
    """Plain segmentor eval: logits -> argmax -> confusion matrix."""

    def step(variables, points, labels, valid):
        logits = model.apply(variables, points, False)
        pred = jnp.argmax(logits, axis=-1)
        row_ok = (jnp.arange(points.shape[0]) < valid)
        mask = jnp.broadcast_to(row_ok[:, None], labels.shape)
        return confusion_matrix(pred, labels, num_classes, mask)

    data_s, rep_s = _shardings(mesh)
    if mesh is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(rep_s, data_s, data_s, rep_s),
                   out_shardings=rep_s)


def make_coding_step(model, num_base: int,
                     mesh: Optional[Mesh] = None) -> Callable:
    """One accumulation step of base-class geometric-word coding collection
    (reference train.py:156-218, vectorised over a BATCH of blocks).

    For each base class c (label c+1): sum of per-point one-hot GW vectors and
    point counts. For background (label 0): per-BLOCK mean GW vector + a
    per-block bg-present count (the reference averages block means).

    signature: (variables, points (B,N,Cin), labels (B,N), gp) ->
        (cls_sums (num_base, K), cls_counts (num_base,),
         bg_mean_sum (K,), bg_block_count ())
    """

    def step(variables, points, labels, gp):
        points = unpack_points(points)   # no-op on dense f32 batches
        labels = unpack_labels(labels)
        _, _, gw = model.apply(variables, points, gp, False,
                               method="get_features")      # (B, N, K)
        onehot = jax.nn.one_hot(labels, num_base + 1, dtype=gw.dtype)
        # class sums over all points of the batch
        sums = jnp.einsum("bnc,bnk->ck", onehot, gw,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=(0, 1))              # (num_base+1,)
        # bg: mean per block, summed over blocks that contain bg points
        bg_mask = onehot[..., 0]                           # (B, N)
        bg_cnt_per_block = jnp.sum(bg_mask, axis=1)        # (B,)
        bg_sum_per_block = jnp.einsum("bn,bnk->bk", bg_mask, gw,
                                      preferred_element_type=jnp.float32)
        has_bg = (bg_cnt_per_block > 0).astype(jnp.float32)
        bg_means = bg_sum_per_block / jnp.maximum(
            bg_cnt_per_block, 1.0)[:, None]
        bg_mean_sum = jnp.einsum("b,bk->k", has_bg, bg_means)
        return sums[1:], counts[1:], bg_mean_sum, jnp.sum(has_bg)

    data_s, rep_s = _shardings(mesh)
    if mesh is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(rep_s, data_s, data_s, rep_s),
                   out_shardings=(rep_s, rep_s, rep_s, rep_s))


def make_fg_feat_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Support-shot foreground feature extraction for prototype registration
    (reference train.py:266-277 via capl.py:71-88), batched over ALL shots
    (and all seeds) at once — the reference's 150 bs=1 forwards collapse
    into one compiled step.

    signature: (variables, points (S,N,Cin), mask (S,N), gp) ->
        (fg_sums (S,C), fg_counts (S,), gw_hists (S,K))

    The shot axis is replicated rather than mesh-sharded: S (= seeds x
    classes x k_shot) rarely divides the mesh and the whole call is a tiny
    fraction of a validation sweep.
    """

    def step(variables, points, mask, gp):
        return model.apply(variables, points, mask, gp, method="get_fg_feat")

    if mesh is None:
        return jax.jit(step)
    _, rep_s = _shardings(mesh)
    return jax.jit(step, in_shardings=(rep_s, rep_s, rep_s, rep_s),
                   out_shardings=(rep_s, rep_s, rep_s))
