"""Raw-dataset collection tests on miniature synthetic raw layouts:
S3DIS instance-txt rooms and ScanNet binary-PLY scans."""
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data.preprocess import (
    collect_s3dis,
    collect_s3dis_scene,
    collect_scannet_scene,
    load_scannet_label_map,
    read_ply_xyzrgb,
)
from gfs3dseg_gws_tpu.data.registry import S3DIS_CLASSNAMES, SCANNET_CLASSNAMES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------- #
# fixtures: miniature raw datasets
# --------------------------------------------------------------------------- #

def _write_s3dis_raw(root, areas=("Area_1", "Area_2", "Area_3", "Area_4",
                                  "Area_5", "Area_6")):
    rng = np.random.default_rng(0)
    for area in areas:
        for room in ("office_1",):
            anno = os.path.join(root, area, room, "Annotations")
            os.makedirs(anno)
            for inst in ("wall_1", "chair_1", "chair_2", "stairs_1"):
                pts = rng.uniform(0, 3, size=(50, 6))
                pts[:, 3:6] = rng.integers(0, 256, (50, 3))
                np.savetxt(os.path.join(anno, f"{inst}.txt"), pts, fmt="%.4f")


def _write_ply(path, xyz, rgb):
    n = len(xyz)
    header = (b"ply\n"
              b"format binary_little_endian 1.0\n"
              + f"element vertex {n}\n".encode()
              + b"property float x\nproperty float y\nproperty float z\n"
              b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
              b"end_header\n")
    with open(path, "wb") as f:
        f.write(header)
        for i in range(n):
            f.write(struct.pack("<fffBBB", *xyz[i], *rgb[i].astype(int)))


def _write_scannet_raw(root):
    scene = "scene0000_00"
    sdir = os.path.join(root, scene)
    os.makedirs(sdir)
    rng = np.random.default_rng(1)
    n = 60
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3))
    _write_ply(os.path.join(sdir, f"{scene}_vh_clean_2.ply"), xyz, rgb)
    # 3 over-segmentation segments of 20 points each
    segs = [i // 20 for i in range(n)]
    with open(os.path.join(sdir, f"{scene}_vh_clean_2.0.010000.segs.json"),
              "w") as f:
        json.dump({"segIndices": segs}, f)
    # seg 0 -> wall, seg 1 -> chair; seg 2 unlabeled
    agg = {"segGroups": [{"label": "wall", "segments": [0]},
                         {"label": "office chair", "segments": [1]}]}
    with open(os.path.join(sdir, f"{scene}.aggregation.json"), "w") as f:
        json.dump(agg, f)
    # tsv mapping raw -> nyu40class
    tsv = os.path.join(root, "labels.tsv")
    with open(tsv, "w") as f:
        f.write("id\traw_category\tnyu40class\n")
        f.write("1\twall\twall\n")
        f.write("2\toffice chair\tchair\n")
    return root, tsv, scene


# --------------------------------------------------------------------------- #
# tests
# --------------------------------------------------------------------------- #

class TestS3DISCollect:
    def test_scene_aggregation_and_unknown_to_clutter(self, tmp_path):
        _write_s3dis_raw(str(tmp_path))
        anno = os.path.join(str(tmp_path), "Area_1", "office_1",
                            "Annotations")
        scene = collect_s3dis_scene(anno, S3DIS_CLASSNAMES)
        assert scene.shape == (200, 7)
        labels = set(int(v) for v in np.unique(scene[:, 6]))
        wall = S3DIS_CLASSNAMES.index("wall")
        chair = S3DIS_CLASSNAMES.index("chair")
        clutter = S3DIS_CLASSNAMES.index("clutter")
        # 'stairs' is not a class name -> clutter (reference behaviour)
        assert labels == {wall, chair, clutter}
        assert (scene[:, 6] == chair).sum() == 100

    def test_area_split(self, tmp_path):
        raw = str(tmp_path / "raw")
        out = str(tmp_path / "out")
        _write_s3dis_raw(raw)
        train = collect_s3dis(raw, out, S3DIS_CLASSNAMES, train=True)
        test = collect_s3dis(raw, out, S3DIS_CLASSNAMES, train=False)
        assert len(train) == 5 and all("Area_6" not in p for p in train)
        assert len(test) == 1 and "Area_6" in test[0]
        assert os.path.exists(os.path.join(out, "scenes", "train_data",
                                           "Area_1_office_1.npy"))


class TestScanNetCollect:
    def test_ply_reader_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        xyz = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (10, 3))
        path = str(tmp_path / "t.ply")
        _write_ply(path, xyz, rgb)
        out = read_ply_xyzrgb(path)
        np.testing.assert_allclose(out[:, :3], xyz, rtol=1e-6)
        np.testing.assert_array_equal(out[:, 3:6], rgb)

    def test_scene_labels_via_segments(self, tmp_path):
        root, tsv, scene = _write_scannet_raw(str(tmp_path))
        label_map = load_scannet_label_map(tsv, SCANNET_CLASSNAMES)
        assert label_map["wall"] == SCANNET_CLASSNAMES.index("wall")
        assert label_map["office chair"] == SCANNET_CLASSNAMES.index("chair")
        data = collect_scannet_scene(os.path.join(root, scene), scene,
                                     label_map)
        # reference semantics (collect_scannet_data.py:48-111): the scene
        # is the instance-major concatenation of segGroup points — seg 2's
        # 20 vertices are in NO group and therefore EXCLUDED (class-0
        # points come only from annotated-but-unmappable instances)
        assert data.shape == (40, 7)
        wall = SCANNET_CLASSNAMES.index("wall")
        chair = SCANNET_CLASSNAMES.index("chair")
        np.testing.assert_array_equal(data[:20, 6], wall)
        np.testing.assert_array_equal(data[20:40, 6], chair)


def test_preprocess_cli_end_to_end(tmp_path):
    """collect_s3dis + room2blocks through the real CLI."""
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "ds")
    _write_s3dis_raw(raw)
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(args):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "preprocess.py")] + args,
            capture_output=True, text=True, env=env, timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        return proc

    run(["collect_s3dis", "--data_path", raw, "--out_root", out, "--train"])
    run(["room2blocks", "--data_path", os.path.join(out, "scenes"),
         "--train", "--min_npts", "10"])
    blocks = os.path.join(out, "blocks_bs1_s1", "data")
    assert os.listdir(blocks)
    block = np.load(os.path.join(blocks, os.listdir(blocks)[0]))
    assert block.shape[1] == 7


def test_collect_scannet_canonical_split_default(tmp_path):
    """collect_scannet with NO user-supplied meta reproduces the canonical
    v2 split from the vendored artifacts: a scene named in the vendored
    scannetv2_val.txt lands in test_data, others in train_data."""
    from gfs3dseg_gws_tpu.data.preprocess import (
        collect_scannet,
        load_scannet_val_scenes,
        scannet_meta_paths,
    )
    from gfs3dseg_gws_tpu.data.registry import SCANNET_CLASSNAMES

    tsv, val_txt = scannet_meta_paths()
    assert os.path.exists(tsv) and os.path.exists(val_txt)
    val_scenes = load_scannet_val_scenes()
    assert len(val_scenes) == 312  # canonical v2 validation split

    scans = tmp_path / "scans"
    val_name = val_scenes[0]
    train_name = "scene9999_00"
    assert train_name not in val_scenes
    rng = np.random.default_rng(4)
    for scene in (val_name, train_name):
        sdir = os.path.join(str(scans), scene)
        os.makedirs(sdir)
        n = 40
        xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (n, 3))
        _write_ply(os.path.join(sdir, f"{scene}_vh_clean_2.ply"), xyz, rgb)
        with open(os.path.join(
                sdir, f"{scene}_vh_clean_2.0.010000.segs.json"), "w") as f:
            json.dump({"segIndices": [i // 20 for i in range(n)]}, f)
        with open(os.path.join(sdir,
                               f"{scene}.aggregation.json"), "w") as f:
            json.dump({"segGroups": [{"label": "wall", "segments": [0]},
                                     {"label": "chair", "segments": [1]}]},
                      f)
    out_root = str(tmp_path / "out")
    written = collect_scannet(str(scans), out_root, SCANNET_CLASSNAMES)
    assert len(written) == 2
    assert os.path.exists(os.path.join(out_root, "scenes", "test_data",
                                       f"{val_name}.npy"))
    assert os.path.exists(os.path.join(out_root, "scenes", "train_data",
                                       f"{train_name}.npy"))
