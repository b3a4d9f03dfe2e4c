"""GW-mechanism ablation probe: is the geometric-word path load-bearing?

Trains the GFS pipeline on the GEOMETRY-SIGNATURE synthetic dataset
(class identity carried by local structure, data/synthetic.py::
make_synthetic_geometry_blocks) and then evaluates the SAME trained
checkpoint four ways:

  full        eval_weight=1.2, real energy-thresholded codings  (the method)
  beta1       eval_weight=1.0                 (reweighting off, train.py:816)
  ones        coding-all-ones, eval_weight=1.2 (argmax-equivalent to beta1 —
              weight becomes a uniform x1.2; asserted here, not assumed)
  energy_lo   codings re-thresholded at --energy_lo (default 0.3)

The paper's claim (reference model/capl.py:179-188: logits *= beta where the
point's geometric word is in the class coding) predicts full > beta1 on
novel mIoU when codings discriminate. Prints one JSON line with all four
results; used to calibrate tests/test_gw_mechanism.py and the
LEARNING_RUN.json ablation entries.

Usage: python scripts/gw_mechanism_probe.py [--epochs 15] [--npts 128]
       [--kmeans]  (extract the basis with the real get_basis chain
                    instead of a random Gaussian basis)
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import json
import pickle

import numpy as np


def evaluate_with_codings(setup, variables, train_cfg, base_coding,
                          novel_coding_override=None, mesh=None):
    """evaluate_gfs's tail with explicit codings (pipelines/gfs.py:681-771
    keeps the production surface; the probe substitutes codings here)."""
    from gfs3dseg_gws_tpu.pipelines.gfs import (register_novel_protos,
                                                validate_multi)

    n_base = len(setup.train_class_names)
    main_proto = np.asarray(variables["params"]["main_proto"])
    geneds, novel_codings = [], []
    for supp in setup.supp_datasets:
        gened, novel_coding = register_novel_protos(
            setup.model, variables, setup.gp, supp, main_proto, n_base,
            setup.test_learning_order_idx, train_cfg.energy, mesh)
        geneds.append(gened)
        novel_codings.append(novel_coding if novel_coding_override is None
                             else novel_coding_override)
    class _Out:                        # gp_acc/gp_novel_acc diagnostics
        cprint = staticmethod(print)

    metrics = validate_multi(
        setup.model, variables, setup.gp, setup.val_dataset,
        np.stack(geneds), base_coding, np.stack(novel_codings),
        setup.all_learning_order, setup.test_class_names,
        len(setup.all_class_names), train_cfg.batch_size, mesh,
        logger=_Out())
    sums = np.zeros(4)
    for m in metrics:
        sums += np.asarray(m[:4])
    sums /= len(setup.supp_datasets)
    return {"mean": round(float(sums[0]), 4), "base": round(float(sums[1]), 4),
            "novel": round(float(sums[2]), 4), "hm": round(float(sums[3]), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--npts", type=int, default=128)
    ap.add_argument("--num_gw", type=int, default=32)
    ap.add_argument("--n_train_blocks", type=int, default=36)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--energy", type=float, default=0.9)
    ap.add_argument("--energy_lo", type=float, default=0.3)
    ap.add_argument("--k_shot", type=int, default=5)
    ap.add_argument("--seed", type=int, default=321)
    ap.add_argument("--root", type=str, default="/tmp/gfs3d_gw_probe")
    ap.add_argument("--kmeans", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gfs3dseg_gws_tpu.data import make_synthetic_geometry_blocks
    from gfs3dseg_gws_tpu.pipelines.gfs import (build_setup, init_variables,
                                                train_gfs)
    from gfs3dseg_gws_tpu.utils.checkpoint import (load_basis,
                                                   load_checkpoint,
                                                   restore_into)
    from gfs3dseg_gws_tpu.utils.config import (DataConfig, ModelConfig,
                                               TrainConfig)

    on_tpu = jax.default_backend() == "tpu"
    train_dir = _os.path.join(args.root, "blocks_bs1.0_s1.0")
    test_dir = _os.path.join(args.root, "blocks_bs1.0_s1.0_test")
    if not _os.path.isdir(train_dir):
        # 2x npts per block: with 3-4 classes/block the per-class patches
        # must clear the registry's >max(5% N, 100)-point qualifying rule
        # (reference dataloaders/s3dis.py:58-73)
        make_synthetic_geometry_blocks(
            args.root, n_train_blocks=args.n_train_blocks, n_test_blocks=13,
            points_per_block=2 * args.npts, seed=19)

    basis_path = _os.path.join(args.root, "basis.pkl")
    if not _os.path.exists(basis_path):
        if args.kmeans:
            # the real chain: short backbone pretrain -> k-means basis
            from gfs3dseg_gws_tpu.pipelines.basis import extract_basis
            from gfs3dseg_gws_tpu.pipelines.pretrain import pretrain
            from gfs3dseg_gws_tpu.utils.config import PretrainConfig
            model_cfg0 = ModelConfig(pc_npts=args.npts, use_pallas=on_tpu)
            data_cfg0 = DataConfig(dataset="s3dis", cvfold=0,
                                   data_path=train_dir, pc_npts=args.npts)
            pt_dir = _os.path.join(args.root, "pretrain")
            pt_npz = _os.path.join(pt_dir, "checkpoint.npz")
            if not _os.path.exists(pt_npz):
                out_pt = pretrain(
                    model_cfg0, data_cfg0,
                    PretrainConfig(batch_size=args.batch_size, n_iters=6,
                                   eval_interval=2, seed=args.seed,
                                   log_dir=pt_dir),
                    export_torch=False)
                if not _os.path.exists(pt_npz):
                    # tiny datasets can have an empty 10% valid split ->
                    # no best-mIoU save; persist the final state instead
                    from gfs3dseg_gws_tpu.utils.checkpoint import \
                        save_checkpoint
                    st = out_pt["state"]
                    save_checkpoint(pt_npz, {
                        "params": jax.device_get(st.params),
                        "batch_stats": jax.device_get(st.batch_stats)})
            basis = extract_basis(
                model_cfg0, data_cfg0, args.num_gw,
                _os.path.join(pt_dir, "checkpoint.npz"), args.root,
                seed=123, batch_size=args.batch_size)
        else:
            basis = np.random.default_rng(41).standard_normal(
                (args.num_gw, 192)).astype(np.float32)
        with open(basis_path, "wb") as f:
            pickle.dump(basis, f)

    model_cfg = ModelConfig(pc_npts=args.npts, use_pallas=on_tpu)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=args.npts,
                          k_shot=args.k_shot, total_classes=13)
    save = _os.path.join(args.root, "gfs")
    pt_ckpt = _os.path.join(args.root, "pretrain", "checkpoint.npz")
    train_cfg = TrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                            eval_interval=5, coding_interval=5,
                            energy=args.energy, eval_weight=1.2,
                            seed=args.seed, basis_path=basis_path,
                            save_path=save, print_freq=1000, h2d="auto",
                            use_pretrain_weight=_os.path.exists(pt_ckpt),
                            pretrain_checkpoint_path=(
                                pt_ckpt if _os.path.exists(pt_ckpt) else ""))
    ckpts = glob.glob(_os.path.join(save, "train_epoch_*.npz"))
    if not ckpts:
        out = train_gfs(model_cfg, data_cfg, train_cfg, mesh=None)
        print("train history:", json.dumps(out["history"]))
        ckpts = glob.glob(_os.path.join(save, "train_epoch_*.npz"))
    # latest by EPOCH NUMBER (lexicographic sort puts epoch 4 after 14)
    ckpt = max(ckpts, key=lambda p: int(
        _os.path.basename(p).split("_")[2]))

    basis = load_basis(basis_path)
    results = {}
    for tag, ew in (("full", 1.2), ("beta1", 1.0)):
        cfg = TrainConfig(batch_size=args.batch_size, energy=args.energy,
                          eval_weight=ew, seed=args.seed,
                          basis_path=basis_path, save_path=save,
                          model_checkpoint_path=ckpt, print_freq=1000)
        setup = build_setup(model_cfg, data_cfg, cfg, basis)
        variables = init_variables(setup, data_cfg, cfg.seed)
        flat, _ = load_checkpoint(ckpt)
        variables = restore_into(variables, flat)
        coding = np.load(_os.path.join(
            save, f"base_class_gp_coding_energy={args.energy}.npz"))["coding"]
        results[tag] = evaluate_with_codings(setup, variables, cfg, coding)
        if tag == "full":
            # coding-all-ones at beta=1.2 (uniform x1.2 -> argmax-equal
            # to beta1; recorded measured, not assumed)
            ones_b = np.ones_like(coding)
            ones_n = np.ones((len(setup.test_class_names),
                              basis.shape[0]), np.float32)
            results["ones"] = evaluate_with_codings(
                setup, variables, cfg, ones_b, novel_coding_override=ones_n)
            # energy sweep: re-threshold codings from the SAME checkpoint
            # (coverage rises with energy; gp_acc diagnostics printed)
            from gfs3dseg_gws_tpu.pipelines.gfs import collect_base_codings
            for e in (args.energy_lo, 0.95, 0.999):
                e_coding, _ = collect_base_codings(
                    setup.model, variables, setup.gp,
                    setup.train_data_noaug, len(setup.train_class_names),
                    e, args.batch_size)
                cfg_e = TrainConfig(batch_size=args.batch_size, energy=e,
                                    eval_weight=1.2, seed=args.seed,
                                    basis_path=basis_path, save_path=save,
                                    print_freq=1000)
                results[f"energy_{e}"] = evaluate_with_codings(
                    setup, variables, cfg_e, e_coding)
    print(json.dumps({"probe": "gw_mechanism", "npts": args.npts,
                      "epochs": args.epochs,
                      "kmeans_basis": bool(args.kmeans),
                      "results": results}))


if __name__ == "__main__":
    main()
