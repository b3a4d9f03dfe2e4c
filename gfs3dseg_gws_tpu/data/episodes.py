"""Episodic few-shot datasets for the baselines
(reference pretrain/dataloaders/loader.py:144-362).

EpisodeDataset synthesises N-way K-shot episodes on the fly from the
class2scans registry (blacklisting reused scans); StaticEpisodeBank
materialises a fixed bank of test episodes into .h5 files with the exact
reference schema (support_ptclouds/support_masks/query_ptclouds/query_labels/
sampled_classes) so banks are interchangeable with the reference.
"""
from __future__ import annotations

import glob
import os
from itertools import combinations
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gfs3dseg_gws_tpu.data.registry import DatasetRegistry, make_registry
from gfs3dseg_gws_tpu.data.sampler import LegacyRNG, sample_k_pointclouds


class EpisodeDataset:
    """On-the-fly N-way K-shot episode synthesis."""

    def __init__(self, data_path: str, dataset_name: str, cvfold: int = 0,
                 num_episode: int = 50_000, n_way: int = 3, k_shot: int = 5,
                 n_queries: int = 1, mode: str = "train",
                 num_point: int = 2048, pc_attribs: str = "xyzrgbXYZ",
                 pc_augm: bool = False, pc_augm_config: Optional[Dict] = None,
                 registry: Optional[DatasetRegistry] = None):
        self.data_path = data_path
        self.n_way = n_way
        self.k_shot = k_shot
        self.n_queries = n_queries
        self.num_episode = num_episode
        self.num_point = num_point
        self.pc_attribs = pc_attribs
        self.pc_augm = pc_augm
        self.pc_augm_config = pc_augm_config

        ds = registry or make_registry(dataset_name, cvfold, data_path)
        self.classes = np.array(ds.train_classes if mode == "train"
                                else ds.test_classes)
        self.class2scans = ds.class2scans

    def __len__(self):
        return self.num_episode

    def __getitem__(self, index: int,
                    rng: Optional[np.random.Generator] = None,
                    n_way_classes: Optional[Sequence[int]] = None):
        rng = rng or np.random.default_rng()
        if n_way_classes is not None:
            sampled = np.array(n_way_classes)
        else:
            sampled = rng.choice(self.classes, self.n_way, replace=False)
        return self.generate_one_episode(sampled, rng) + (
            sampled.astype(np.int32),)

    def generate_one_episode(self, sampled_classes: np.ndarray,
                             rng: np.random.Generator):
        """(support (w,s,N,C), support_masks (w,s,N), query (w*q,N,C),
        query_labels (w*q,N))."""
        s_pc, s_mask, q_pc, q_lbl = [], [], [], []
        black_list: List[str] = []
        for cls in sampled_classes:
            names = [x for x in self.class2scans[int(cls)]
                     if x not in black_list]
            selected = rng.choice(names, self.k_shot + self.n_queries,
                                  replace=False)
            black_list.extend(selected)
            q_names = selected[: self.n_queries]
            s_names = selected[self.n_queries:]

            qp, ql, _ = sample_k_pointclouds(
                self.data_path, self.num_point, self.pc_attribs, self.pc_augm,
                self.pc_augm_config, q_names, int(cls), sampled_classes,
                is_support=False, rng=rng)
            sp, sm, _ = sample_k_pointclouds(
                self.data_path, self.num_point, self.pc_attribs, self.pc_augm,
                self.pc_augm_config, s_names, int(cls), sampled_classes,
                is_support=True, rng=rng)
            q_pc.append(qp)
            q_lbl.append(ql)
            s_pc.append(sp)
            s_mask.append(sm)

        return (np.stack(s_pc).astype(np.float32),
                np.stack(s_mask).astype(np.int32),
                np.concatenate(q_pc).astype(np.float32),
                np.concatenate(q_lbl).astype(np.int64))


class StaticEpisodeBank:
    """Fixed bank of test episodes in reference .h5 format."""

    def __init__(self, data_path: str, dataset_name: str, cvfold: int = 0,
                 num_episode_per_comb: int = 100, n_way: int = 3,
                 k_shot: int = 5, n_queries: int = 1, num_point: int = 2048,
                 pc_attribs: str = "xyzrgbXYZ", mode: str = "valid",
                 seed: int = 321,
                 registry: Optional[DatasetRegistry] = None):
        source = EpisodeDataset(data_path, dataset_name, cvfold=cvfold,
                                n_way=n_way, k_shot=k_shot,
                                n_queries=n_queries, mode="test",
                                num_point=num_point, pc_attribs=pc_attribs,
                                registry=registry)
        self.classes = source.classes
        tag = "" if mode == "valid" else "_test"
        self.bank_path = os.path.join(
            data_path, f"S_{cvfold}_N_{n_way}_K_{k_shot}{tag}_episodes_"
            f"{num_episode_per_comb}_pts_{num_point}")

        if os.path.exists(self.bank_path):
            self.file_names = sorted(
                glob.glob(os.path.join(self.bank_path, "*.h5")),
                key=lambda p: int(os.path.basename(p)[:-3]))
        else:
            os.makedirs(self.bank_path)
            # LegacyRNG replays the reference's global-stream draws
            # (pretrain/dataloaders/loader.py:293-322 consumes the global
            # legacy RNG whose state at bank creation is `seed`); the class
            # combinations iterate in the registry's fold-table order,
            # exactly the reference's `combinations(self.classes, n_way)`
            rng = LegacyRNG(seed)
            self.file_names = []
            episode_ind = 0
            for comb in combinations([int(c) for c in self.classes], n_way):
                for _ in range(num_episode_per_comb):
                    data = source.generate_one_episode(np.array(comb), rng)
                    out = os.path.join(self.bank_path, f"{episode_ind}.h5")
                    write_episode(out, data + (np.array(comb, np.int32),))
                    self.file_names.append(out)
                    episode_ind += 1

    def __len__(self):
        return len(self.file_names)

    def __getitem__(self, index: int):
        return read_episode(self.file_names[index])


def write_episode(path: str, data):
    import h5py as h5

    s_pc, s_mask, q_pc, q_lbl, sampled = data
    with h5.File(path, "w") as f:
        f.create_dataset("support_ptclouds", data=s_pc, dtype="float32")
        f.create_dataset("support_masks", data=s_mask, dtype="int32")
        f.create_dataset("query_ptclouds", data=q_pc, dtype="float32")
        f.create_dataset("query_labels", data=q_lbl, dtype="int64")
        f.create_dataset("sampled_classes", data=sampled, dtype="int32")


def read_episode(path: str):
    import h5py as h5

    with h5.File(path, "r") as f:
        return (f["support_ptclouds"][:], f["support_masks"][:],
                f["query_ptclouds"][:], f["query_labels"][:],
                f["sampled_classes"][:])
