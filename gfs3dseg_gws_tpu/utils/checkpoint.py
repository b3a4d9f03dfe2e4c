"""Checkpoint I/O.

Native format: a single .npz holding the flattened pytree ("/"-joined paths)
plus a small JSON header — dependency-free, memory-mappable, and safe to load
(no pickled code).

Torch converters cover the reference's three formats (SURVEY.md §5):
  1. pretrain `checkpoint.tar` = {'params': encoder.state_dict()}
     (reference util/checkpoint_util.py:9-23,46-47);
  2. GFS model {'epoch','state_dict','optimizer','max_iou'}
     (reference util/checkpoint_util.py:25-44, train.py:561);
  3. side artifacts: pickled basis / torch-saved coding tensors.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# --------------------------------------------------------------------------- #
# native npz checkpoints
# --------------------------------------------------------------------------- #

def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def save_checkpoint(path: str, tree, meta: Optional[Dict[str, Any]] = None):
    """Save a pytree (+ JSON-serialisable metadata) to one .npz file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(tree)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load the flat dict and metadata back."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != "__meta__"}
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in \
            z.files else {}
    return flat, meta


def restore_into(target_tree, flat: Dict[str, np.ndarray], strict: bool = True):
    """Rebuild a pytree with `target_tree`'s structure from a flat dict.

    strict=False skips missing keys (keeps target values), like the
    reference's intersect-and-load (util/checkpoint_util.py:14-18).
    """
    paths, treedef = jax.tree_util.tree_flatten_with_path(target_tree)
    leaves = []
    for path, leaf in paths:
        key = "/".join(_path_str(p) for p in path)
        if key in flat:
            val = flat[key]
            if val.shape != np.asarray(leaf).shape:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {val.shape} vs "
                    f"model {np.asarray(leaf).shape}")
            leaves.append(val.astype(np.asarray(leaf).dtype))
        elif strict:
            raise KeyError(f"missing checkpoint key: {key}")
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# --------------------------------------------------------------------------- #
# torch-format converters
# --------------------------------------------------------------------------- #

def _to_np(t) -> np.ndarray:
    # copy=True: a view aliasing torch storage silently mutates "our"
    # converted weights if a torch optimizer later steps the source model
    # (oracle tests run both frameworks side by side); the one-time copy
    # cost is negligible next to the aliasing footgun
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                    copy=True)


def _conv_kernel(w) -> np.ndarray:
    """torch conv1x1 weight (out, in, 1[, 1]) -> Dense kernel (in, out)."""
    w = _to_np(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _to_np(sd[f"{prefix}.weight"]),
              "bias": _to_np(sd[f"{prefix}.bias"])}
    stats = {"mean": _to_np(sd[f"{prefix}.running_mean"]),
             "var": _to_np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_torch_dgcnn_encoder(sd: Dict, n_edgeconv: int = 3,
                                widths_per_block: int = 2,
                                n_mlp: int = 2) -> Tuple[Dict, Dict]:
    """Map a torch DGCNN state dict (keys like `edge_convs.0.layer.0.weight`)
    onto our DGCNN params/batch_stats subtrees.

    The reference Sequential interleaves [Conv, BN, LeakyReLU] per width, so
    width j uses indices 3j (conv) and 3j+1 (bn).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_edgeconv):
        blk_p: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        base = f"edge_convs.{i}.layer"
        # first width: decomposed kernel, shape (2C, w0)
        blk_p["layer0_kernel"] = _conv_kernel(sd[f"{base}.0.weight"])
        bn_p, bn_s = _bn(sd, f"{base}.1")
        blk_p["layer0_bn"] = bn_p
        blk_s["layer0_bn"] = bn_s
        for j in range(1, widths_per_block):
            lp: Dict[str, Any] = {
                "conv": {"kernel": _conv_kernel(sd[f"{base}.{3*j}.weight"])}}
            bn_p, bn_s = _bn(sd, f"{base}.{3*j+1}")
            lp["bn"] = bn_p
            blk_p[f"layer{j}"] = lp
            blk_s[f"layer{j}"] = {"bn": bn_s}
        params[f"edgeconv{i}"] = blk_p
        stats[f"edgeconv{i}"] = blk_s

    mlp_p: Dict[str, Any] = {}
    mlp_s: Dict[str, Any] = {}
    for j in range(n_mlp):
        lp = {"conv": {"kernel": _conv_kernel(sd[f"conv.layer.{3*j}.weight"])}}
        bn_p, bn_s = _bn(sd, f"conv.layer.{3*j+1}")
        lp["bn"] = bn_p
        mlp_p[f"layer{j}"] = lp
        mlp_s[f"layer{j}"] = {"bn": bn_s}
    params["mlp"] = mlp_p
    stats["mlp"] = mlp_s
    return params, stats


def convert_torch_base_learner(sd: Dict, prefix: str = "base_learner",
                               n: int = 2) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n):
        params[f"conv{i}"] = {
            "kernel": _conv_kernel(sd[f"{prefix}.convs.{i}.0.weight"]),
            "bias": _to_np(sd[f"{prefix}.convs.{i}.0.bias"])}
        bn_p, bn_s = _bn(sd, f"{prefix}.convs.{i}.1")
        params[f"bn{i}"] = bn_p
        stats[f"bn{i}"] = bn_s
    return params, stats


def convert_torch_attention(sd: Dict, prefix: str = "att_learner") -> Dict:
    return {name: {"kernel": _conv_kernel(sd[f"{prefix}.{name}.weight"])}
            for name in ("q_map", "k_map", "v_map")}


def convert_torch_segmenter(sd: Dict, prefix: str = "segmenter"
                            ) -> Tuple[Dict, Dict]:
    """Sequential: conv0(no bias),bn0,relu,conv1,bn1,relu,dropout,conv2."""
    params: Dict[str, Any] = {
        "conv0": {"kernel": _conv_kernel(sd[f"{prefix}.0.weight"])},
        "conv1": {"kernel": _conv_kernel(sd[f"{prefix}.3.weight"]),
                  "bias": _to_np(sd[f"{prefix}.3.bias"])},
        "conv2": {"kernel": _conv_kernel(sd[f"{prefix}.7.weight"]),
                  "bias": _to_np(sd[f"{prefix}.7.bias"])},
    }
    stats: Dict[str, Any] = {}
    bn_p, bn_s = _bn(sd, f"{prefix}.1")
    params["bn0"] = bn_p
    stats["bn0"] = bn_s
    bn_p, bn_s = _bn(sd, f"{prefix}.4")
    params["bn1"] = bn_p
    stats["bn1"] = bn_s
    return params, stats


def _torch_load_safe(path: str):
    """Load a torch-format checkpoint; tensors come back numpy or torch.

    First choice is the TORCH-FREE zip reader (utils/torch_reader.py) so a
    TPU host without torch installed can still consume reference `.pth` /
    `checkpoint.tar` artifacts (reference util/checkpoint_util.py:25-44) —
    it returns numpy arrays, which every converter below already accepts
    via `_to_np`. Anything it cannot parse (legacy non-zip format, globals
    outside its whitelist) falls back to torch.load(weights_only=True),
    tolerant of numpy scalar metadata: real reference-trained checkpoints
    carry np.float64 metrics — train.py saves `max_iou` and
    proto_train.py/mpti_train.py save `IoU` straight from numpy means —
    which torch>=2.6's weights_only unpickler rejects ("GLOBAL
    numpy.../scalar was not an allowed global"). Retry with just the numpy
    scalar-reconstruction globals allowlisted; still no arbitrary-code
    unpickling."""
    from gfs3dseg_gws_tpu.utils import torch_reader

    if torch_reader.is_zip_checkpoint(path) and not os.environ.get(
            "GFS3D_FORCE_TORCH_LOAD"):
        try:
            return torch_reader.torch_free_load(path)
        except Exception:
            pass  # fall through to torch.load below

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import importlib

        allow = [np.dtype]
        # the pickled global's module path depends on the numpy that SAVED
        # the checkpoint (numpy 1.x: numpy.core..., numpy 2.x: _core)
        for mod in ("numpy._core.multiarray", "numpy.core.multiarray"):
            try:
                allow.append(importlib.import_module(mod).scalar)
            except Exception:
                continue
        try:
            allow.extend([np.dtypes.Float64DType, np.dtypes.Float32DType])
        except AttributeError:
            pass
        with torch.serialization.safe_globals(allow):
            return torch.load(path, map_location="cpu", weights_only=True)


def load_torch_pretrain_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Reference `checkpoint.tar` -> (encoder params, encoder batch_stats)
    subtrees for DGCNN (to be merged under 'encoder')."""
    ckpt = _torch_load_safe(os.path.join(path, "checkpoint.tar")
                            if os.path.isdir(path) else path)
    return convert_torch_dgcnn_encoder(ckpt["params"])


def load_torch_gfs_checkpoint(path: str) -> Tuple[Dict, Dict, Dict]:
    """Reference GFS model .pth -> (params, batch_stats, meta) for GWCAPL."""
    ckpt = _torch_load_safe(path)
    sd = ckpt["state_dict"]
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    enc_p, enc_s = convert_torch_dgcnn_encoder(enc_sd)
    bl_p, bl_s = convert_torch_base_learner(sd)
    params: Dict[str, Any] = {
        "encoder": enc_p,
        "base_learner": bl_p,
        "att_learner": convert_torch_attention(sd),
        "fusion": {"kernel": _conv_kernel(sd["fusion.0.weight"]),
                   "bias": _to_np(sd["fusion.0.bias"])},
        "main_proto": _to_np(sd["main_proto"]),
        "bg_proto": _to_np(sd["bg_proto"]),
    }
    fus_bn_p, fus_bn_s = _bn(sd, "fusion.1")
    params["fusion_bn"] = fus_bn_p
    stats: Dict[str, Any] = {"encoder": enc_s, "base_learner": bl_s,
                             "fusion_bn": fus_bn_s}
    meta = {"epoch": int(ckpt.get("epoch", 0)),
            "max_iou": float(ckpt.get("max_iou", 0.0))}
    return params, stats, meta


def load_torch_coding(path: str) -> np.ndarray:
    """Reference base_class_gp_coding_energy={e}.pth — a torch.save of the
    (n_base, num_gw) multi-hot coding tensor (reference train.py:563,
    reloaded at train.py:466-467) -> float32 numpy array."""
    t = _torch_load_safe(path)
    return np.asarray(_to_np(t), np.float32)


def save_torch_coding(coding: np.ndarray, path: str) -> None:
    """Export a base-class coding to the reference's .pth artifact format."""
    import torch

    torch.save(torch.from_numpy(np.asarray(coding, np.float32)), path)


def save_torch_pretrain_checkpoint(encoder_params: Dict, encoder_stats: Dict,
                                   out_dir: str):
    """Export our DGCNN encoder back to the reference `checkpoint.tar`
    format so reference tooling can consume TPU-trained backbones."""
    import torch

    # key layout only; the tensor packing is the shared _sd_put_conv /
    # _sd_put_bn helpers (one owner: they also cast to f32, which a bf16
    # param tree needs for torch.from_numpy)
    sd = {}
    for i in range(3):
        blk_p = encoder_params[f"edgeconv{i}"]
        blk_s = encoder_stats[f"edgeconv{i}"]
        base = f"edge_convs.{i}.layer"
        _sd_put_conv(sd, f"{base}.0", blk_p["layer0_kernel"], conv2d=True)
        _sd_put_bn(sd, f"{base}.1", blk_p["layer0_bn"], blk_s["layer0_bn"])
        j = 1
        while f"layer{j}" in blk_p:
            _sd_put_conv(sd, f"{base}.{3*j}",
                         blk_p[f"layer{j}"]["conv"]["kernel"], conv2d=True)
            _sd_put_bn(sd, f"{base}.{3*j+1}", blk_p[f"layer{j}"]["bn"],
                       blk_s[f"layer{j}"]["bn"])
            j += 1
    for j in range(2):
        _sd_put_conv(sd, f"conv.layer.{3*j}",
                     encoder_params["mlp"][f"layer{j}"]["conv"]["kernel"])
        _sd_put_bn(sd, f"conv.layer.{3*j+1}",
                   encoder_params["mlp"][f"layer{j}"]["bn"],
                   encoder_stats["mlp"][f"layer{j}"]["bn"])

    os.makedirs(out_dir, exist_ok=True)
    torch.save({"params": sd}, os.path.join(out_dir, "checkpoint.tar"))


def _sd_put_conv(sd: Dict, key: str, kernel, conv2d: bool = False,
                 bias=None):
    import torch

    w = np.asarray(kernel).T
    w = w.reshape(w.shape + ((1, 1) if conv2d else (1,)))
    sd[key + ".weight"] = torch.from_numpy(np.ascontiguousarray(
        w.astype(np.float32)))
    if bias is not None:
        sd[key + ".bias"] = torch.from_numpy(np.asarray(bias, np.float32))


def _sd_put_bn(sd: Dict, key: str, p, s):
    import torch

    sd[key + ".weight"] = torch.from_numpy(np.asarray(p["scale"],
                                                      np.float32))
    sd[key + ".bias"] = torch.from_numpy(np.asarray(p["bias"], np.float32))
    sd[key + ".running_mean"] = torch.from_numpy(
        np.asarray(s["mean"], np.float32))
    sd[key + ".running_var"] = torch.from_numpy(
        np.asarray(s["var"], np.float32))
    sd[key + ".num_batches_tracked"] = torch.tensor(0)


def _export_feat_state(sd: Dict, params: Dict, batch_stats: Dict):
    """Write the shared feature-extractor submodules (DGCNN encoder +
    BaseLearner + SelfAttention or linear mapper) into a reference-keyed
    state dict. The same module trio appears in the reference's GW/CAPL
    model (model/capl.py:40-52) and its ProtoNet/MPTI baselines
    (pretrain/models/protonet.py:48-54, mpti.py:60-66) under identical
    attribute names."""
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    for i in range(3):
        base = f"encoder.edge_convs.{i}.layer"
        blk_p, blk_s = enc_p[f"edgeconv{i}"], enc_s[f"edgeconv{i}"]
        _sd_put_conv(sd, f"{base}.0", blk_p["layer0_kernel"], conv2d=True)
        _sd_put_bn(sd, f"{base}.1", blk_p["layer0_bn"], blk_s["layer0_bn"])
        j = 1
        while f"layer{j}" in blk_p:
            _sd_put_conv(sd, f"{base}.{3*j}",
                         blk_p[f"layer{j}"]["conv"]["kernel"], conv2d=True)
            _sd_put_bn(sd, f"{base}.{3*j+1}", blk_p[f"layer{j}"]["bn"],
                       blk_s[f"layer{j}"]["bn"])
            j += 1
    for j in range(2):
        _sd_put_conv(sd, f"encoder.conv.layer.{3*j}",
                     enc_p["mlp"][f"layer{j}"]["conv"]["kernel"])
        _sd_put_bn(sd, f"encoder.conv.layer.{3*j+1}",
                   enc_p["mlp"][f"layer{j}"]["bn"],
                   enc_s["mlp"][f"layer{j}"]["bn"])

    bl_p, bl_s = params["base_learner"], batch_stats["base_learner"]
    i = 0
    while f"conv{i}" in bl_p:
        _sd_put_conv(sd, f"base_learner.convs.{i}.0",
                     bl_p[f"conv{i}"]["kernel"],
                     bias=bl_p[f"conv{i}"]["bias"])
        _sd_put_bn(sd, f"base_learner.convs.{i}.1", bl_p[f"bn{i}"],
                   bl_s[f"bn{i}"])
        i += 1

    if "att_learner" in params:
        for name in ("q_map", "k_map", "v_map"):
            _sd_put_conv(sd, f"att_learner.{name}",
                         params["att_learner"][name]["kernel"])
    if "linear_mapper" in params:
        _sd_put_conv(sd, "linear_mapper",
                     params["linear_mapper"]["kernel"])


def save_torch_gfs_checkpoint(params: Dict, batch_stats: Dict, path: str,
                              epoch: int = 0, max_iou: float = 0.0):
    """Export a GWCAPL model to the reference's .pth format
    ({'epoch','state_dict','optimizer','max_iou'}, train.py:561) so reference
    tooling can evaluate TPU-trained models."""
    import torch

    sd: Dict[str, Any] = {}
    _export_feat_state(sd, params, batch_stats)
    _sd_put_conv(sd, "fusion.0", params["fusion"]["kernel"],
                 bias=params["fusion"]["bias"])

    _sd_put_bn(sd, "fusion.1", params["fusion_bn"],
               batch_stats["fusion_bn"])
    sd["main_proto"] = torch.from_numpy(np.asarray(params["main_proto"],
                                                   np.float32))
    sd["bg_proto"] = torch.from_numpy(np.asarray(params["bg_proto"],
                                                 np.float32))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save({"epoch": epoch, "state_dict": sd, "optimizer": {},
                "max_iou": max_iou}, path)


def save_torch_fewshot_checkpoint(params: Dict, batch_stats: Dict,
                                  out_dir: str, iteration: int = 0,
                                  iou: float = 0.0, loss: float = 0.0):
    """Export a ProtoNet/MPTI feature extractor to the reference's
    episodic-baseline `checkpoint.tar` format ({'iteration',
    'model_state_dict','loss','IoU'}, pretrain/runs/proto_train.py:72-78 /
    mpti_train.py) so reference tooling can evaluate TPU-trained
    baselines. `params`/`batch_stats` are our learner trees ({'feat':
    {'encoder','base_learner','att_learner'|'linear_mapper'}})."""
    import torch

    sd: Dict[str, Any] = {}
    _export_feat_state(sd, params["feat"], batch_stats["feat"])
    os.makedirs(out_dir, exist_ok=True)
    torch.save({"iteration": iteration, "model_state_dict": sd,
                "loss": loss, "IoU": iou},
               os.path.join(out_dir, "checkpoint.tar"))


def load_torch_fewshot_checkpoint(path: str) -> Tuple[Dict, Dict, Dict]:
    """Reference episodic-baseline checkpoint -> (params, batch_stats,
    meta) shaped for our ProtoNet/MPTI models.

    `path` is the checkpoint DIRECTORY (the reference's
    pretrain/utils/checkpoint_util.py:26 appends 'checkpoint.tar') or the
    .tar file itself. Distinguished from the PRETRAIN checkpoint.tar
    ({'params': encoder sd}) by the 'model_state_dict' key."""
    p = path if path.endswith(".tar") else os.path.join(path,
                                                        "checkpoint.tar")
    ckpt = _torch_load_safe(p)
    if "model_state_dict" not in ckpt:
        if "params" in ckpt:
            raise ValueError(
                f"{p} is a PRETRAIN encoder checkpoint "
                "({'params': ...}); pass it as the pretrain checkpoint "
                "(pretrain_checkpoint_path / pretrain-to-npz), not as an "
                "episodic-baseline model checkpoint")
        raise ValueError(f"{p} has no 'model_state_dict' key; not an "
                         "episodic-baseline checkpoint.tar")
    sd = ckpt["model_state_dict"]
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    enc_p, enc_s = convert_torch_dgcnn_encoder(enc_sd)
    bl_p, bl_s = convert_torch_base_learner(sd)
    params: Dict[str, Any] = {"encoder": enc_p, "base_learner": bl_p}
    stats: Dict[str, Any] = {"encoder": enc_s, "base_learner": bl_s}
    if any(k.startswith("att_learner.") for k in sd):
        params["att_learner"] = convert_torch_attention(sd)
    if "linear_mapper.weight" in sd:
        params["linear_mapper"] = {
            "kernel": _conv_kernel(sd["linear_mapper.weight"])}
    meta = {k: float(ckpt[k]) if k != "iteration" else int(ckpt[k])
            for k in ("iteration", "IoU", "loss") if k in ckpt}
    return {"feat": params}, {"feat": stats}, meta


def load_basis(path: str) -> np.ndarray:
    """Pickled geometric-word basis (reference get_basis.py:219-222)."""
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f), dtype=np.float32)


def save_basis(path: str, basis: np.ndarray):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(np.asarray(basis), f)
