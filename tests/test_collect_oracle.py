"""Preprocessing parity vs the REFERENCE's own collector / block splitter.

Runs the reference's actual `collect_point_label` (pretrain/preprocess/
collect_s3dis_data.py:16-55) and `room2blocks` (room2blocks.py:14-55) on
the same synthetic raw S3DIS tree as our `collect_s3dis_scene` /
`room2blocks`, closing the L0 preprocessing stage of the oracle chain.

Collection row ORDER is filesystem-dependent in the reference (unsorted
`glob.glob` over instance files) and deterministic here (sorted) — so
scene contents are compared as sorted row sets; the block splitter is
order-preserving given the same input, so its outputs must match
byte-for-byte block-for-block.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

from gfs3dseg_gws_tpu.data.preprocess import (collect_s3dis_scene,
                                              room2blocks)
from gfs3dseg_gws_tpu.data.registry import S3DIS_CLASSNAMES

from test_collect import _write_s3dis_raw

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                                reason="reference tree not available")


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE_ROOT, "pretrain", "preprocess",
                           relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sorted_rows(a):
    return a[np.lexsort(a.T[::-1])]


def test_s3dis_collection_matches_reference(tmp_path):
    raw = str(tmp_path / "raw")
    _write_s3dis_raw(raw)

    ref = _load_ref_module("collect_s3dis_data.py", "ref_collect_s3dis")
    # the reference defines the class tables under __main__
    # (collect_s3dis_data.py:85-86) from the canonical 13-name meta file
    ref.CLASS_NAMES = list(S3DIS_CLASSNAMES)
    ref.CLASS2LABEL = {c: i for i, c in enumerate(S3DIS_CLASSNAMES)}

    for area in sorted(os.listdir(raw)):
        area_dir = os.path.join(raw, area)
        if not os.path.isdir(area_dir):
            continue
        for scene in sorted(os.listdir(area_dir)):
            anno = os.path.join(area_dir, scene, "Annotations")
            if not os.path.isdir(anno):
                continue
            out = str(tmp_path / f"ref_{area}_{scene}.npy")
            ref.collect_point_label(anno, out)
            ref_arr = np.load(out)
            our_arr = collect_s3dis_scene(anno, S3DIS_CLASSNAMES)
            assert our_arr.shape == ref_arr.shape, f"{area}/{scene}"
            np.testing.assert_array_equal(
                _sorted_rows(np.asarray(our_arr, np.float64)),
                _sorted_rows(ref_arr),
                err_msg=f"{area}/{scene}: collected rows differ")


def test_scannet_collection_matches_reference(tmp_path):
    """The reference's own collect_point_label (collect_scannet_data.py:
    48-111) vs collect_scannet_scene on one synthetic scan, byte-for-byte
    (instance-major order, unannotated-segment vertices excluded, an
    unmappable raw label -> class 0). plyfile is shimmed with our binary
    reader (itself pinned by test_collect's round trip); the label tsv is
    the vendored canonical 608-line scannetv2-labels.combined.tsv."""
    import json
    import types

    from gfs3dseg_gws_tpu.data.preprocess import (load_scannet_label_map,
                                                  scannet_meta_paths)
    from gfs3dseg_gws_tpu.data.registry import SCANNET_CLASSNAMES

    from test_collect import _write_ply

    # one scan: 3 groups (wall, office chair -> chair, ceiling ->
    # unmappable/unannotated) + one segment in no group (excluded)
    scene = "scene0000_00"
    sdir = os.path.join(str(tmp_path), scene)
    os.makedirs(sdir)
    rng = np.random.default_rng(5)
    n = 80
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3))
    _write_ply(os.path.join(sdir, f"{scene}_vh_clean_2.ply"), xyz, rgb)
    segs = [i // 20 for i in range(n)]                    # 4 segments
    with open(os.path.join(sdir, f"{scene}_vh_clean_2.0.010000.segs.json"),
              "w") as f:
        json.dump({"segIndices": segs}, f)
    agg = {"segGroups": [{"label": "wall", "segments": [0]},
                         {"label": "office chair", "segments": [1]},
                         {"label": "ceiling", "segments": [2]}]}
    with open(os.path.join(sdir, f"{scene}.aggregation.json"), "w") as f:
        json.dump(agg, f)
    tsv_path = scannet_meta_paths()[0]

    # plyfile shim backed by our reader
    from gfs3dseg_gws_tpu.data.preprocess import read_ply_xyzrgb

    class _Vertex:
        def __init__(self, arr):
            self.count = len(arr)
            self.data = {k: arr[:, i].astype(np.float32) for i, k in
                         enumerate(("x", "y", "z", "red", "green", "blue"))}

    class _PlyData:
        def __init__(self, arr):
            self._v = _Vertex(arr)

        def __getitem__(self, key):
            assert key == "vertex"
            return self._v

        @staticmethod
        def read(f):
            return _PlyData(read_ply_xyzrgb(f.name))

    saved = sys.modules.get("plyfile")
    sys.modules["plyfile"] = types.SimpleNamespace(PlyData=_PlyData)
    try:
        ref = _load_ref_module("collect_scannet_data.py",
                               "ref_collect_scannet")
    finally:
        if saved is None:
            sys.modules.pop("plyfile", None)
        else:
            sys.modules["plyfile"] = saved
    ref.CLASS_NAMES = list(SCANNET_CLASSNAMES)
    ref.RAW2SCANNET = ref.get_raw2scannet_label_map(tsv_path)
    # the reference tallies per-class point counts into a module global
    # defined under __main__ (collect_scannet_data.py:100-101)
    ref.class_point_dict = {i: 0 for i in range(len(SCANNET_CLASSNAMES))}

    out = str(tmp_path / "ref_scene.npy")
    ref.collect_point_label(sdir, scene, out)
    ref_arr = np.load(out)

    label_map = load_scannet_label_map(tsv_path, SCANNET_CLASSNAMES)
    from gfs3dseg_gws_tpu.data.preprocess import collect_scannet_scene
    ours = collect_scannet_scene(sdir, scene, label_map)

    assert ours.shape == ref_arr.shape == (60, 7)   # seg 3 excluded
    np.testing.assert_array_equal(np.asarray(ours, np.float32),
                                  ref_arr.astype(np.float32))
    assert set(ours[:, 6]) == {0.0,
                               float(SCANNET_CLASSNAMES.index("wall")),
                               float(SCANNET_CLASSNAMES.index("chair"))}


def test_room2blocks_matches_reference(tmp_path):
    ref = _load_ref_module("room2blocks.py", "ref_room2blocks")

    rng = np.random.default_rng(13)
    n = 6000
    xyz = rng.uniform(0, 3.2, (n, 3))
    rgb = rng.integers(0, 256, (n, 3)).astype(np.float64)
    lbl = rng.integers(0, 13, (n, 1)).astype(np.float64)
    room = np.concatenate([xyz, rgb, lbl], axis=1)

    for bs, stride, min_npts in [(1.0, 1.0, 100), (1.0, 0.5, 50),
                                 (2.0, 1.0, 200)]:
        # the reference mutates `data` in place (xyz -= xyz_min on a view,
        # room2blocks.py:28-29) — feed each side its own copy
        ref_blocks = ref.room2blocks(room.copy(), bs, stride, min_npts)
        our_blocks = room2blocks(room.copy(), bs, stride, min_npts)
        assert len(our_blocks) == len(ref_blocks), (bs, stride, min_npts)
        for i, (a, b) in enumerate(zip(our_blocks, ref_blocks)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float64), b,
                err_msg=f"block {i} differs at bs={bs} stride={stride}")
