"""Full GFS train/evaluate pipeline ON the virtual 8-device mesh — the
shape the driver and real v5e-8 runs use (pipelines auto-mesh when
jax.device_count() > 1; here we pass it explicitly)."""
import os
import pickle

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data import make_synthetic_blocks
from gfs3dseg_gws_tpu.parallel import make_mesh
from gfs3dseg_gws_tpu.pipelines.gfs import evaluate_gfs, train_gfs
from gfs3dseg_gws_tpu.utils.config import DataConfig, ModelConfig, TrainConfig, replace

NPTS = 96
TINY = dict(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
            dgcnn_mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
            main_dim=16, dgcnn_k=5, use_pallas=False, pc_npts=NPTS)


@pytest.mark.slow
def test_train_and_evaluate_on_mesh(tmp_path):
    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=13, points_per_block=1500,
        seed=13)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (10, 24)).astype(np.float32), f)

    mesh = make_mesh()
    assert mesh.devices.size == 8

    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2)
    save = os.path.join(root, "gfs")
    train_cfg = TrainConfig(batch_size=8, epochs=2, eval_interval=2,
                            coding_interval=2, basis_path=basis_path,
                            save_path=save, print_freq=1000)
    out = train_gfs(model_cfg, data_cfg, train_cfg, mesh=mesh,
                    max_steps_per_epoch=3)
    assert out["history"], "mesh training should evaluate"
    assert np.isfinite(out["history"][-1]["mean_iou"])

    ckpts = [f for f in os.listdir(save) if f.startswith("train_")]
    eval_cfg = replace(train_cfg, only_evaluate=True,
                       model_checkpoint_path=os.path.join(save, ckpts[0]))
    metrics = evaluate_gfs(model_cfg, data_cfg, eval_cfg, mesh=mesh)
    assert np.isfinite(metrics["mean_iou"])


@pytest.mark.slow
def test_steps_per_dispatch_matches_per_step_loop(tmp_path):
    """steps_per_dispatch=3 over 5 steps (one scanned chunk + 2 leftover
    single steps) trains to the same parameters as the per-step loop —
    the production multi-step dispatch changes launch latency only."""
    import jax

    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=8, points_per_block=1500,
        seed=17)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (10, 24)).astype(np.float32), f)
    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2)
    mesh = make_mesh()

    def run(spd, tag):
        cfg = TrainConfig(batch_size=8, epochs=1, evaluate=False,
                          basis_path=basis_path, print_freq=2,
                          save_path=os.path.join(root, tag),
                          steps_per_dispatch=spd)
        out = train_gfs(model_cfg, data_cfg, cfg, mesh=mesh,
                        max_steps_per_epoch=5)
        return jax.device_get(out["state"].params)

    p1 = run(1, "spd1")
    p3 = run(3, "spd3")
    flat1 = jax.tree_util.tree_leaves(p1)
    flat3 = jax.tree_util.tree_leaves(p3)
    for a, b in zip(flat1, flat3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.slow
def test_packed_h2d_train_on_mesh(tmp_path):
    """h2d="packed" end to end on the mesh: the train loop ships single
    (S,B,N,10)/(B,N,10) u8 buffers (scan chunk + leftover single steps)
    and validation consumes the single-buffer packed eval batches — the
    TPU default transfer mode, forced here on the CPU mesh."""
    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=13, points_per_block=1500,
        seed=23)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (10, 24)).astype(np.float32), f)
    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2)
    train_cfg = TrainConfig(batch_size=8, epochs=2, eval_interval=2,
                            coding_interval=2, basis_path=basis_path,
                            save_path=os.path.join(root, "gfs"),
                            print_freq=1000, steps_per_dispatch=2,
                            h2d="packed")
    out = train_gfs(model_cfg, data_cfg, train_cfg, mesh=make_mesh(),
                    max_steps_per_epoch=3)
    assert out["history"] and np.isfinite(out["history"][-1]["mean_iou"])


@pytest.mark.slow
def test_dxp_mesh_eval_matches_data_mesh(tmp_path):
    """--mesh dxp (2-D data x points sequence parallelism, the N >> 2048
    long-context configuration at CI toy scale: 96 points split 2-way on
    the `points` axis, batch split 4-way on `data`) evaluates a checkpoint
    to the same metrics as the 1-D data mesh. mesh_shape="dxp" goes through
    evaluate_gfs's own mesh construction — the same path the CLI flag
    takes."""
    root = str(tmp_path)
    train_dir, test_dir = make_synthetic_blocks(
        root, n_train_blocks=40, n_test_blocks=13, points_per_block=1500,
        seed=31)
    basis_path = os.path.join(root, "basis.pkl")
    with open(basis_path, "wb") as f:
        pickle.dump(np.random.default_rng(0).standard_normal(
            (10, 24)).astype(np.float32), f)
    model_cfg = ModelConfig(**TINY)
    data_cfg = DataConfig(dataset="s3dis", cvfold=0, data_path=train_dir,
                          testing_data_path=test_dir, pc_npts=NPTS, k_shot=2)
    save = os.path.join(root, "gfs")
    train_cfg = TrainConfig(batch_size=8, epochs=1, eval_interval=1,
                            coding_interval=1, basis_path=basis_path,
                            save_path=save, print_freq=1000)
    train_gfs(model_cfg, data_cfg, train_cfg, mesh=make_mesh(),
              max_steps_per_epoch=2)
    ckpts = [f for f in os.listdir(save) if f.startswith("train_")]
    assert ckpts

    base = replace(train_cfg, only_evaluate=True,
                   model_checkpoint_path=os.path.join(save, ckpts[0]))
    m_data = evaluate_gfs(model_cfg, data_cfg,
                          replace(base, save_path=os.path.join(root, "e1")),
                          mesh=None)
    m_dxp = evaluate_gfs(model_cfg, data_cfg,
                         replace(base, save_path=os.path.join(root, "e2"),
                                 mesh_shape="dxp", mesh_sp=2),
                         mesh=None)
    for k in ("mean_iou", "base_iou", "novel_iou", "hm_iou"):
        np.testing.assert_allclose(m_dxp[k], m_data[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    np.testing.assert_allclose(m_dxp["per_class"], m_data["per_class"],
                               rtol=1e-5, atol=1e-6)
