"""Padded-bucket graph data loading.

Replaces the reference's `utils/data_handling.get_data_loaders`
(`utils/data_handling.py:7-36` in /root/reference: load every PyG .pt into a
Python list, block-diagonal DataLoader) with a TPU-friendly loader:

  * graphs are stored one-per-file as compressed npz `GraphSample`s
    (`graph_<i>.npz`), written by the dataset-creation pipelines,
  * batches are padded to a fixed (max_nodes, max_edges) bucket shared across
    the whole epoch so every step hits the same compiled executable,
  * shuffling is seeded and deterministic (SURVEY.md §7 hard part 6),
  * an optional leading device axis pads the *number of graphs* in the final
    batch so shapes stay static.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from radargnn_tpu.graph.batch import GraphBatch, GraphSample, stack_samples


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class GraphDataLoader:
    """Iterates GraphBatches of `batch_size` padded graphs."""

    def __init__(self, samples: List[GraphSample], batch_size: int,
                 shuffle: bool, bg_index: int, seed: int = 0,
                 max_nodes: Optional[int] = None,
                 max_edges: Optional[int] = None,
                 pad_align: int = 64, drop_last: bool = False,
                 csr_tiling=None, cache_batches: bool = False,
                 halo_partition: Optional[dict] = None):
        if not samples:
            raise ValueError("empty sample list")
        self.samples = samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.bg_index = bg_index
        self.drop_last = drop_last
        self.csr_tiling = csr_tiling
        if isinstance(csr_tiling, dict):
            # dense (v4) tiling: buckets must align to both the x-window
            # node blocks and the receiver-tile size
            pad_align = max(pad_align, int(np.lcm(
                csr_tiling["node_block"], csr_tiling["r_tile"])))
        elif csr_tiling is not None:
            pad_align = max(pad_align, csr_tiling[0])
        if halo_partition is not None:
            # bucket must split evenly into mp node shards, and the graph
            # count into dp data shards
            pad_align = int(np.lcm(pad_align, halo_partition["mp"]))
            if batch_size % max(halo_partition.get("dp", 1), 1):
                raise ValueError("batch_size must divide evenly over the "
                                 "mesh data axis for halo training")
        self._rng = np.random.default_rng(seed)
        self._pad_cache: dict = {}
        self._empty: Optional[GraphSample] = None
        self.cache_batches = cache_batches
        self._batch_cache: Optional[List[GraphBatch]] = None
        # loader-level static roll-pass bound so every batch hits the same
        # compiled windowed-kernel executable
        self.roll_passes: Optional[int] = None
        if csr_tiling is not None and not isinstance(csr_tiling, dict) \
                and len(csr_tiling) >= 3:
            if len(csr_tiling) >= 5 and csr_tiling[4] is not None:
                # spread tiling caps runs at run_cap by construction
                self.roll_passes = (int(csr_tiling[4]) - 1).bit_length()
            else:
                from radargnn_tpu.graph.batch import roll_passes_bound
                self.roll_passes = roll_passes_bound(samples, csr_tiling[1])

        n_max = max(s.num_nodes for s in samples)
        e_max = max(s.num_edges for s in samples)
        self.max_nodes = max_nodes or _round_up(n_max, pad_align)
        self.max_edges = max_edges or _round_up(e_max, pad_align)

        self.halo_partition: Optional[dict] = None
        if halo_partition is not None and halo_partition.get("budgets"):
            # caller supplied dataset-wide budgets (get_data_loaders merges
            # across splits incl. the batch-padding empty graph)
            self.halo_partition = dict(halo_partition)
        elif halo_partition is not None:
            # budget pass: plan every sample (plus the batch-padding empty
            # graph) to find the dataset-wide static-shape maxima, then all
            # real padding uses the shared budgets so one executable covers
            # every batch
            from radargnn_tpu.graph.batch import halo_dataset_budgets
            if self.max_nodes % halo_partition["mp"]:
                raise ValueError("bucket size not divisible by mp")
            self.halo_partition = dict(halo_partition)
            self.halo_partition["budgets"] = halo_dataset_budgets(
                samples + [_empty_like(samples[0])], self.max_nodes,
                self.max_edges, bg_index, csr_tiling, halo_partition)

    def __len__(self) -> int:
        n = len(self.samples)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[GraphBatch]:
        if self.cache_batches:
            # stack + device-put every batch ONCE; later epochs iterate the
            # device-resident batches (shuffle permutes batch ORDER, not
            # membership — a documented trade-off that removes the
            # per-epoch host->device transfer entirely)
            if self._batch_cache is None:
                self._batch_cache = list(self._iter_batches(shuffled=False))
            idx = np.arange(len(self._batch_cache))
            if self.shuffle:
                self._rng.shuffle(idx)
            for i in idx:
                yield self._batch_cache[i]
            return
        yield from self._iter_batches(shuffled=self.shuffle)

    def _iter_batches(self, shuffled: bool) -> Iterator[GraphBatch]:
        order = np.arange(len(self.samples))
        if shuffled:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            batch_samples = [self.samples[i] for i in idx]
            # pad the graph count so the leading axis is static (one shared
            # empty sample so its padded form stays in the pad cache)
            if len(batch_samples) < self.batch_size:
                if self._empty is None:
                    self._empty = _empty_like(batch_samples[0])
                while len(batch_samples) < self.batch_size:
                    batch_samples.append(self._empty)
            yield stack_samples(batch_samples, self.max_nodes, self.bg_index,
                                self.max_edges, csr_tiling=self.csr_tiling,
                                pad_cache=self._pad_cache,
                                roll_passes=self.roll_passes,
                                halo_partition=self.halo_partition)


def _empty_like(sample: GraphSample) -> GraphSample:
    """A graph with zero valid nodes/edges matching a sample's feature dims."""
    return GraphSample(
        node_feat=np.zeros((0, sample.node_feat.shape[1]), np.float32),
        edge_feat=np.zeros((0, sample.edge_feat.shape[1]), np.float32),
        senders=np.zeros((0,), np.int32), receivers=np.zeros((0,), np.int32),
        labels=np.zeros((0,), np.int32),
        boxes=np.zeros((0, sample.boxes.shape[1]), np.float32),
        pos=np.zeros((0, 2), np.float32), vel=np.zeros((0, 2), np.float32))


def load_split_samples(root: str, split: str) -> List[GraphSample]:
    paths = sorted(glob.glob(f"{root}/{split}/*.npz"))
    return [GraphSample.load_npz(p) for p in paths]


def get_data_loaders(splits: List[str], root: str, batch_size: int,
                     shuffle: bool, bg_index: int = 5, seed: int = 0,
                     csr_tiling=None, halo_partition: Optional[dict] = None,
                     ) -> Tuple[Dict[str, GraphDataLoader], dict]:
    """Reads graph npz files per split into loaders + the dataset config.json.

    Parity: `utils/data_handling.py:7-36` (same signature shape; adds
    bg_index/seed for deterministic padding).
    """
    loaders: Dict[str, GraphDataLoader] = {}
    # share one bucket across splits so train/val use the same executable
    all_samples = {s: load_split_samples(root, s) for s in splits}
    n_max = max(max((g.num_nodes for g in ss), default=1)
                for ss in all_samples.values())
    e_max = max(max((g.num_edges for g in ss), default=1)
                for ss in all_samples.values())
    if isinstance(csr_tiling, dict):
        align = max(64, int(np.lcm(csr_tiling["node_block"],
                                   csr_tiling["r_tile"])))
    elif csr_tiling:
        align = max(64, csr_tiling[0])
    else:
        align = 64
    if halo_partition is not None:
        align = int(np.lcm(align, halo_partition["mp"]))
    n_bucket = _round_up(n_max, align)
    e_bucket = _round_up(e_max, align)
    halo_by_split: Dict[str, Optional[dict]] = {}
    if halo_partition is not None:
        # one shared budget across splits so train/val share an executable
        from radargnn_tpu.graph.batch import halo_dataset_budgets
        everything = [s for ss in all_samples.values() for s in ss]
        everything.append(_empty_like(everything[0]))
        shared = dict(halo_partition)
        shared["budgets"] = halo_dataset_budgets(
            everything, n_bucket, e_bucket, bg_index, csr_tiling,
            halo_partition)
        halo_by_split = {s: shared for s in splits}
    for split, samples in all_samples.items():
        loaders[split] = GraphDataLoader(
            samples, batch_size, shuffle and split == "train", bg_index,
            seed=seed, max_nodes=n_bucket, max_edges=e_bucket,
            csr_tiling=csr_tiling,
            halo_partition=halo_by_split.get(split))

    config_path = os.path.join(root, "config.json")
    dataset_config = {}
    if os.path.exists(config_path):
        with open(config_path) as f:
            dataset_config = json.load(f)
    return loaders, dataset_config
