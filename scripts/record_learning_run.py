"""Record the production-scale synthetic learning run as a repo artifact.

Runs the full GFS base-stage training (reference train.py:503-588 semantics)
at PRODUCTION scale — N=2048 points, full model widths, fused Pallas
kernels, packed H2D — on the synthetic dataset with learnable class
signatures, and writes `LEARNING_RUN.json` at the repo root: the strong
learning claim (README roadmap: 30-epoch TPU run reaching ~0.65 mean mIoU)
becomes a recorded, reproducible artifact instead of a prose note, and
regressions in the learning dynamics are caught by re-running this script
(tests/test_learning.py covers CI scale with calibrated floors).

Usage: python scripts/record_learning_run.py [--epochs 30] [--out PATH]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import pickle
import subprocess
import time

import numpy as np


def _ablations(args, model_cfg, data_cfg, train_cfg, basis_path):
    """Evaluate the freshly trained best checkpoint with the GW-path
    ablated (reference knobs: --eval_weight train.py:816, --energy
    train.py:830; coding semantics capl.py:92-142). Records whether the
    geometric-word reweighting moves the metric on THIS dataset — the
    round-4 verdict's missing mechanism-level evidence."""
    import glob

    import jax

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from gw_mechanism_probe import evaluate_with_codings

    from gfs3dseg_gws_tpu.pipelines.gfs import (build_setup,
                                                collect_base_codings,
                                                init_variables)
    from gfs3dseg_gws_tpu.utils.checkpoint import (load_basis,
                                                   load_checkpoint,
                                                   restore_into)
    from gfs3dseg_gws_tpu.utils.config import TrainConfig

    save = train_cfg.save_path
    ckpts = glob.glob(_os.path.join(save, "train_epoch_*.npz"))
    if not ckpts:
        return None
    ckpt = max(ckpts, key=lambda p: int(_os.path.basename(p).split("_")[2]))
    basis = load_basis(basis_path)
    out = {"checkpoint": _os.path.basename(ckpt)}
    coding_cache = {}
    for tag, (energy, beta, ones) in {
            "full": (train_cfg.energy, 1.2, False),
            "beta1": (train_cfg.energy, 1.0, False),
            "ones": (train_cfg.energy, 1.2, True),
            "energy_lo": (0.3, 1.2, False),
    }.items():
        cfg = TrainConfig(batch_size=train_cfg.batch_size, energy=energy,
                          eval_weight=beta, seed=train_cfg.seed,
                          basis_path=basis_path, save_path=save,
                          print_freq=1000)
        setup = build_setup(model_cfg, data_cfg, cfg, basis)
        variables = init_variables(setup, data_cfg, cfg.seed)
        flat, _ = load_checkpoint(ckpt)
        variables = restore_into(variables, flat)
        if energy not in coding_cache:
            coding_cache[energy], _ = collect_base_codings(
                setup.model, variables, setup.gp, setup.train_data_noaug,
                len(setup.train_class_names), energy, train_cfg.batch_size)
        coding = coding_cache[energy]
        novel_override = None
        if ones:
            coding = np.ones_like(coding)
            novel_override = np.ones(
                (len(setup.test_class_names), basis.shape[0]), np.float32)
        out[tag] = evaluate_with_codings(setup, variables, cfg, coding,
                                         novel_coding_override=novel_override)
        print(f"ablation {tag}: {out[tag]}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train_blocks", type=int, default=64)
    ap.add_argument("--n_test_blocks", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--npts", type=int, default=2048)
    ap.add_argument("--geometry", action="store_true",
                    help="use the geometry-signature dataset (classes "
                         "separated by local structure; the GW-mechanism "
                         "artifact) and write LEARNING_RUN_GEO.json")
    ap.add_argument("--root", type=str, default="/tmp/gfs3d_learning_run")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax

    from gfs3dseg_gws_tpu.data import (make_synthetic_blocks,
                                       make_synthetic_geometry_blocks)
    from gfs3dseg_gws_tpu.pipelines.gfs import train_gfs
    from gfs3dseg_gws_tpu.utils.config import (DataConfig, ModelConfig,
                                               TrainConfig)

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if not args.out:
        args.out = _os.path.join(
            repo, "LEARNING_RUN_GEO.json" if args.geometry
            else "LEARNING_RUN.json")
    if args.geometry and args.root == "/tmp/gfs3d_learning_run":
        args.root = "/tmp/gfs3d_learning_run_geo"

    on_tpu = jax.default_backend() == "tpu"
    train_dir = _os.path.join(args.root, "blocks_bs1.0_s1.0")
    if not _os.path.isdir(train_dir):
        maker = (make_synthetic_geometry_blocks if args.geometry
                 else make_synthetic_blocks)
        maker(args.root, n_train_blocks=args.n_train_blocks,
              n_test_blocks=args.n_test_blocks,
              points_per_block=args.npts + args.npts // 2,
              seed=4)
    test_dir = _os.path.join(args.root, "blocks_bs1.0_s1.0_test")

    basis_path = _os.path.join(args.root, "basis.pkl")
    if not _os.path.exists(basis_path):
        if args.geometry:
            # the real chain (short backbone pretrain -> k-means words):
            # data-adapted words are what makes codings informative — a
            # random Gaussian basis leaves the coding path nearly inert
            # (measured, scripts/gw_mechanism_probe.py runs)
            from gfs3dseg_gws_tpu.pipelines.basis import extract_basis
            from gfs3dseg_gws_tpu.pipelines.pretrain import pretrain
            from gfs3dseg_gws_tpu.utils.checkpoint import save_checkpoint
            from gfs3dseg_gws_tpu.utils.config import PretrainConfig
            m0 = ModelConfig(pc_npts=args.npts, use_pallas=on_tpu)
            d0 = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                            pc_npts=args.npts)
            pt_dir = _os.path.join(args.root, "pretrain")
            pt_npz = _os.path.join(pt_dir, "checkpoint.npz")
            if not _os.path.exists(pt_npz):
                out_pt = pretrain(
                    m0, d0, PretrainConfig(batch_size=args.batch_size,
                                           n_iters=6, eval_interval=2,
                                           log_dir=pt_dir),
                    export_torch=False)
                if not _os.path.exists(pt_npz):
                    import jax as _jax
                    st = out_pt["state"]
                    save_checkpoint(pt_npz, {
                        "params": _jax.device_get(st.params),
                        "batch_stats": _jax.device_get(st.batch_stats)})
            basis = extract_basis(m0, d0, 150, pt_npz, args.root, seed=123,
                                  batch_size=args.batch_size)
        else:
            basis = np.random.default_rng(0).standard_normal(
                (150, 192)).astype(np.float32)
        with open(basis_path, "wb") as f:
            pickle.dump(basis, f)

    model_cfg = ModelConfig(pc_npts=args.npts, use_pallas=on_tpu)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=args.npts,
                          k_shot=2)
    pt_npz = _os.path.join(args.root, "pretrain", "checkpoint.npz")
    train_cfg = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                            eval_interval=5, coding_interval=5,
                            basis_path=basis_path,
                            save_path=_os.path.join(args.root, "gfs"),
                            print_freq=1000, steps_per_dispatch=2,
                            use_pretrain_weight=_os.path.exists(pt_npz),
                            pretrain_checkpoint_path=(
                                pt_npz if _os.path.exists(pt_npz) else ""))

    t0 = time.time()
    out = train_gfs(model_cfg, data_cfg, train_cfg, mesh=None)
    wall = time.time() - t0
    ablations = _ablations(args, model_cfg, data_cfg, train_cfg, basis_path)

    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    record = {
        "metric": "synthetic_learning_gfs_miou",
        "history": out["history"],
        "final": out["history"][-1] if out["history"] else None,
        "best": out["best"],
        "ablations": ablations,
        "config": {"epochs": args.epochs, "batch_size": args.batch_size,
                   "npts": args.npts, "n_train_blocks": args.n_train_blocks,
                   "n_test_blocks": args.n_test_blocks,
                   "dataset": "geometry" if args.geometry else "blobs",
                   "backend": jax.default_backend(),
                   "use_pallas": on_tpu},
        "wall_s": round(wall, 1),
        "commit": commit,
        "date": time.strftime("%Y-%m-%d"),
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["final"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
