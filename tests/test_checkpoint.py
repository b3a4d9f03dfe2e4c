"""Checkpoint I/O: native npz round trips + torch-format round trips."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfs3dseg_gws_tpu.models import GWCAPL, DGCNN
from gfs3dseg_gws_tpu.utils.checkpoint import (
    _flatten,
    load_checkpoint,
    load_torch_gfs_checkpoint,
    load_torch_pretrain_checkpoint,
    restore_into,
    save_checkpoint,
    save_torch_gfs_checkpoint,
    save_torch_pretrain_checkpoint,
)

TINY = dict(classes=13, base_num=7, num_gw=10, main_dim=16,
            edgeconv_widths=((8, 8), (8, 8), (8, 8)), mlp_widths=(16, 16),
            base_widths=(8, 8), output_dim=8, k=5, use_pallas=False)


@pytest.fixture(scope="module")
def capl_variables():
    model = GWCAPL(**TINY)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 9))
    y = jnp.zeros((2, 32), jnp.int32)
    gp = jax.random.normal(rng, (10, 24))
    return model, model.init({"params": rng, "dropout": rng, "fake": rng},
                             x, y, gp, train=True)


def _assert_trees_equal(a, b):
    fa = _flatten(a)
    fb = _flatten(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], rtol=1e-6,
                                   err_msg=k)


class TestNativeNpz:
    def test_roundtrip_with_meta(self, capl_variables, tmp_path):
        _, variables = capl_variables
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, variables, {"epoch": 7, "max_iou": 0.5})
        flat, meta = load_checkpoint(path)
        assert meta == {"epoch": 7, "max_iou": 0.5}
        restored = restore_into(variables, flat)
        _assert_trees_equal(variables, restored)

    def test_strict_missing_key_raises(self, capl_variables, tmp_path):
        _, variables = capl_variables
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, variables["params"])
        flat, _ = load_checkpoint(path)
        del flat["main_proto"]
        with pytest.raises(KeyError):
            restore_into(variables["params"], flat)
        # non-strict keeps the target value
        restored = restore_into(variables["params"], flat, strict=False)
        np.testing.assert_array_equal(
            np.asarray(restored["main_proto"]),
            np.asarray(variables["params"]["main_proto"]))


class TestTorchFormats:
    def test_gfs_pth_roundtrip(self, capl_variables, tmp_path):
        pytest.importorskip("torch")
        _, variables = capl_variables
        path = str(tmp_path / "model.pth")
        save_torch_gfs_checkpoint(variables["params"],
                                  variables["batch_stats"], path,
                                  epoch=3, max_iou=0.42)
        params, stats, meta = load_torch_gfs_checkpoint(path)
        assert meta == {"epoch": 3, "max_iou": 0.42}
        _assert_trees_equal(variables["params"], params)
        _assert_trees_equal(variables["batch_stats"], stats)

    def test_torch_load_tolerates_numpy_scalar_meta(self, capl_variables,
                                                    tmp_path):
        """REAL reference-trained checkpoints carry np.float64 metrics
        (train.py saves max_iou, proto_train.py saves IoU straight from
        numpy means); torch>=2.6's weights_only unpickler rejects those
        globals unless allowlisted (_torch_load_safe)."""
        torch = pytest.importorskip("torch")
        from gfs3dseg_gws_tpu.utils.checkpoint import (
            load_torch_fewshot_checkpoint,
            save_torch_fewshot_checkpoint,
        )

        _, variables = capl_variables
        path = str(tmp_path / "ref_model.pth")
        save_torch_gfs_checkpoint(variables["params"],
                                  variables["batch_stats"], path)
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        ckpt["max_iou"] = np.array([0.1, 0.74]).mean()     # np.float64
        ckpt["epoch"] = 9
        torch.save(ckpt, path)
        _, _, meta = load_torch_gfs_checkpoint(path)
        assert meta == {"epoch": 9, "max_iou": pytest.approx(0.42)}

        # same for the episodic-baseline format, via the reference's own
        # save layout (proto_train.py:72-78)
        enc = {"feat": {"encoder": variables["params"]["encoder"],
                        "base_learner": variables["params"]["base_learner"],
                        "att_learner": variables["params"]["att_learner"]}}
        enc_s = {"feat": {
            "encoder": variables["batch_stats"]["encoder"],
            "base_learner": variables["batch_stats"]["base_learner"]}}
        fs_dir = str(tmp_path / "fs")
        save_torch_fewshot_checkpoint(enc, enc_s, fs_dir, iteration=5)
        tar = os.path.join(fs_dir, "checkpoint.tar")
        ckpt = torch.load(tar, map_location="cpu", weights_only=True)
        ckpt["IoU"] = np.array([0.2, 0.4]).mean()
        ckpt["loss"] = np.float64(1.5)
        torch.save(ckpt, tar)
        _, _, meta = load_torch_fewshot_checkpoint(fs_dir)
        assert meta == {"iteration": 5, "IoU": pytest.approx(0.3),
                        "loss": pytest.approx(1.5)}

    def test_fewshot_loader_rejects_pretrain_tar(self, tmp_path):
        """A pretrain checkpoint.tar ({'params': ...}) passed as an
        episodic model checkpoint must fail with an actionable error, not
        a KeyError."""
        pytest.importorskip("torch")
        from gfs3dseg_gws_tpu.utils.checkpoint import (
            load_torch_fewshot_checkpoint)

        model = DGCNN(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                      mlp_widths=(16, 16), k=5, use_pallas=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 9)))
        out_dir = str(tmp_path / "pre")
        save_torch_pretrain_checkpoint(variables["params"],
                                       variables["batch_stats"], out_dir)
        with pytest.raises(ValueError, match="PRETRAIN encoder"):
            load_torch_fewshot_checkpoint(out_dir)

    def test_pretrain_tar_roundtrip(self, tmp_path):
        pytest.importorskip("torch")
        model = DGCNN(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                      mlp_widths=(16, 16), k=5, use_pallas=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 9)))
        out_dir = str(tmp_path / "pre")
        save_torch_pretrain_checkpoint(variables["params"],
                                       variables["batch_stats"], out_dir)
        assert os.path.exists(os.path.join(out_dir, "checkpoint.tar"))
        params, stats = load_torch_pretrain_checkpoint(out_dir)
        _assert_trees_equal(variables["params"], params)
        _assert_trees_equal(variables["batch_stats"], stats)

    def test_coding_pth_roundtrip_and_lookup(self, tmp_path):
        """The reference base_class_gp_coding_energy={e}.pth artifact
        (train.py:466-467) round-trips and is found by load_base_coding
        when no .npz exists (converted-reference-checkpoint eval path)."""
        pytest.importorskip("torch")
        from gfs3dseg_gws_tpu.pipelines.gfs import load_base_coding
        from gfs3dseg_gws_tpu.utils.checkpoint import (
            load_torch_coding,
            save_torch_coding,
        )

        coding = (np.random.default_rng(0).random((7, 10)) > 0.5
                  ).astype(np.float32)
        pth = str(tmp_path / "base_class_gp_coding_energy=0.9.pth")
        save_torch_coding(coding, pth)
        np.testing.assert_array_equal(load_torch_coding(pth), coding)

        # .pth found via extra_dirs (e.g. a converted checkpoint's dir)
        found = load_base_coding(str(tmp_path / "nonexistent"), 0.9,
                                 extra_dirs=[str(tmp_path)])
        np.testing.assert_array_equal(found, coding)

        # our .npz takes precedence when both exist
        np.savez(str(tmp_path / "base_class_gp_coding_energy=0.9.npz"),
                 coding=coding * 0.0)
        found = load_base_coding(str(tmp_path), 0.9)
        np.testing.assert_array_equal(found, coding * 0.0)

        # nothing found -> None
        assert load_base_coding(str(tmp_path), 0.95) is None


class TestTorchFreeReader:
    """utils/torch_reader.py — parse torch.save zip archives WITHOUT torch
    (reference util/checkpoint_util.py:25-44 artifacts on a torch-less TPU
    host)."""

    def test_matches_torch_load_on_odd_layouts(self, tmp_path):
        torch = pytest.importorskip("torch")
        from gfs3dseg_gws_tpu.utils.torch_reader import torch_free_load

        base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
        obj = {
            "contig": base.clone(),
            "transposed": base.t(),                    # non-contiguous
            "sliced": base[1:, ::2],                   # offset + stride
            "scalar0d": torch.tensor(7.5),
            "int64": torch.arange(5),
            "bf16": torch.linspace(-2, 2, 8, dtype=torch.bfloat16),
            "npmeta": np.array([0.1, 0.7]).mean(),     # np.float64 scalar
            "plain": 3,
            "nested": {"w": torch.ones(2, 3, 1, 1)},
        }
        path = str(tmp_path / "odd.pth")
        torch.save(obj, path)
        ours = torch_free_load(path)
        ref = torch.load(path, map_location="cpu", weights_only=False)
        for k in ("contig", "transposed", "sliced", "scalar0d", "int64"):
            np.testing.assert_array_equal(ours[k], ref[k].numpy(), err_msg=k)
        np.testing.assert_array_equal(ours["bf16"],
                                      ref["bf16"].float().numpy())
        assert ours["npmeta"] == ref["npmeta"]
        assert ours["plain"] == 3
        np.testing.assert_array_equal(ours["nested"]["w"],
                                      ref["nested"]["w"].numpy())

    def test_rejects_arbitrary_globals(self, tmp_path):
        import pickle
        import zipfile

        # hand-build a zip archive whose pickle names a non-whitelisted
        # global — the restricted unpickler must refuse it
        from gfs3dseg_gws_tpu.utils.torch_reader import torch_free_load

        path = str(tmp_path / "evil.pth")
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("evil/data.pkl", pickle.dumps({"f": os.system}))
        with pytest.raises(pickle.UnpicklingError, match="not allowed"):
            torch_free_load(path)

    def test_legacy_format_falls_back_to_torch(self, tmp_path):
        torch = pytest.importorskip("torch")
        from gfs3dseg_gws_tpu.utils.checkpoint import load_torch_coding

        coding = np.eye(4, dtype=np.float32)
        path = str(tmp_path / "legacy.pth")
        torch.save(torch.from_numpy(coding), path,
                   _use_new_zipfile_serialization=False)
        np.testing.assert_array_equal(load_torch_coding(path), coding)

    def test_loads_reference_checkpoints_with_torch_blocked(
            self, capl_variables, tmp_path):
        """All three reference formats load on a host WITHOUT torch:
        block torch imports in a subprocess and run the load_torch_* paths."""
        pytest.importorskip("torch")
        import subprocess
        import sys

        _, variables = capl_variables
        gfs_path = str(tmp_path / "model.pth")
        save_torch_gfs_checkpoint(variables["params"],
                                  variables["batch_stats"], gfs_path,
                                  epoch=3, max_iou=0.42)
        model = DGCNN(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                      mlp_widths=(16, 16), k=5, use_pallas=False)
        dg_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 9)))
        pre_dir = str(tmp_path / "pre")
        save_torch_pretrain_checkpoint(dg_vars["params"],
                                       dg_vars["batch_stats"], pre_dir)
        from gfs3dseg_gws_tpu.utils.checkpoint import save_torch_coding
        coding_path = str(tmp_path / "coding.pth")
        save_torch_coding(np.eye(3, dtype=np.float32), coding_path)

        script = f"""
import sys
class _BlockTorch:
    def find_spec(self, name, path=None, target=None):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch is blocked in this subprocess")
sys.meta_path.insert(0, _BlockTorch())
import numpy as np
from gfs3dseg_gws_tpu.utils.checkpoint import (
    load_torch_gfs_checkpoint, load_torch_pretrain_checkpoint,
    load_torch_coding)
try:
    import torch  # noqa: F401
    raise SystemExit("torch import was NOT blocked")
except ImportError:
    pass
params, stats, meta = load_torch_gfs_checkpoint({gfs_path!r})
assert meta == {{"epoch": 3, "max_iou": 0.42}}, meta
assert "main_proto" in params and "encoder" in params
p, s = load_torch_pretrain_checkpoint({pre_dir!r})
assert "edgeconv0" in p and "mlp" in p
c = load_torch_coding({coding_path!r})
np.testing.assert_array_equal(c, np.eye(3, dtype=np.float32))
print("TORCHFREE_OK")
"""
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=300,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
        assert out.returncode == 0, out.stderr
        assert "TORCHFREE_OK" in out.stdout
