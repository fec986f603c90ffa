"""Static-shape collation + host loading pipeline.

The reference pads ragged tensors with pad_sequence at collate time and
keeps the GT pair list ragged (dataset/helpers.py:22-50). Here collation
is the hard boundary between ragged host data and the fixed-shape device
program:

* CAD padded to V_CAD (5120), partial cloud to V_PC (2048), eigenbasis
  K_EIG (64) — masks carried explicitly.
* The GT pair list P (used by the reference for C_gt lstsq and NCE
  sampling, scripts/train.py:101, utils/loss.py:27-38) is folded into
  (a) precomputed 30x30 normal-equation matrices for C_gt — exact, no
  ragged data on device — and (b) a fixed-size random subsample of pairs
  for the NCE loss.
* A thread-prefetching loader replaces the torch DataLoader worker pool
  (train.py:62: num_workers=12).
"""
from __future__ import annotations

import queue
import threading

import numpy as np

from ..ops.masking import K_EIG, N_FMAP, V_CAD, V_PC, pad_to

NCE_PAIRS = 4096  # max GT pairs carried per sample for the NCE loss


def make_sample(cad: dict, pc: dict, obj: dict, rng=None,
                v_cad: int = V_CAD, v_pc: int = V_PC,
                n_fmap: int = N_FMAP, nce_pairs: int = NCE_PAIRS) -> dict:
    """One (CAD, PC, obj) triple -> dict of fixed-shape float32 arrays."""
    rng = rng or np.random.default_rng(0)
    nc = len(cad["xyz"])
    npc = len(pc["xyz"])
    pairs = np.asarray(obj["P"], np.int64).reshape(-1, 2)

    # C_gt normal equations from the full pair set (train.py:101):
    # min_C || Phi2[P[:,1]] C - Phi1[P[:,0]] ||  ->  (A) C = (B)
    p2 = cad["evecs"][:, :n_fmap][pairs[:, 0]] if len(pairs) else \
        np.zeros((0, n_fmap), np.float32)
    p1 = pc["evecs"][:, :n_fmap][pairs[:, 1]] if len(pairs) else \
        np.zeros((0, n_fmap), np.float32)
    A = p1.T @ p1  # Phi2^p^T Phi2^p  (PC side is "shape 2")
    B = p1.T @ p2  # Phi2^p^T Phi1^p

    # NCE pair subsample (loss.py:27-30: without replacement)
    if len(pairs) > nce_pairs:
        sel = rng.choice(len(pairs), nce_pairs, replace=False)
        sub = pairs[sel]
    else:
        sub = pairs
    pair_buf = np.zeros((nce_pairs, 2), np.int32)
    pair_buf[:len(sub)] = sub
    pair_valid = np.zeros(nce_pairs, bool)
    pair_valid[:len(sub)] = True

    def shape_block(ops, v_max, n_valid):
        block = {
            "xyz": pad_to(ops["xyz"], v_max).astype(np.float32),
            "mass": pad_to(ops["mass"], v_max).astype(np.float32),
            "evals": np.asarray(ops["evals"], np.float32)[:K_EIG],
            "evecs": pad_to(ops["evecs"], v_max).astype(np.float32),
            "valid": np.arange(v_max) < n_valid,
        }
        # optional gather-form tangent-gradient operators (gradient-
        # feature DiffusionNet variant); zero-coefficient padding
        if "grad_idx" in ops:
            block["grad_idx"] = pad_to(
                np.asarray(ops["grad_idx"]), v_max).astype(np.int32)
            block["grad_cx"] = pad_to(
                np.asarray(ops["grad_cx"]), v_max).astype(np.float32)
            block["grad_cy"] = pad_to(
                np.asarray(ops["grad_cy"]), v_max).astype(np.float32)
        return block

    return {
        "cad": shape_block(cad, v_cad, nc),
        "pc": shape_block(pc, v_pc, npc),
        "pairs": pair_buf,
        "pairs_valid": pair_valid,
        "cgt_A": A.astype(np.float32),
        "cgt_B": B.astype(np.float32),
        "overlap12": pad_to(np.asarray(obj["overlap_12"], np.float32), v_cad),
        "overlap21": pad_to(np.asarray(obj["overlap_21"], np.float32), v_pc),
        "align_pc": pad_to(np.asarray(obj["align_pc"], np.float32), v_pc),
        "R_m2c": np.asarray(obj["R_m2c"], np.float32),
        "t_m2c": np.asarray(obj["t_m2c"], np.float32),
        # zeros when the cache predates the K field; consumers treat an
        # all-zero K as "intrinsics unavailable"
        "K": (np.asarray(obj["K"], np.float32) if "K" in obj
              else np.zeros((3, 3), np.float32)),
        "im_hw": (np.asarray(obj["im_hw"], np.int32) if "im_hw" in obj
                  else np.asarray([480, 640], np.int32)),
        "diam_cad": np.float32(obj["diam_cad"]),
        "obj_id": np.int32(obj["obj_id"]),
        "visib_fract": np.float32(obj["visib_fract"]),
    }


def collate(samples: list[dict]) -> dict:
    """Stack fixed-shape samples into a batch (leading axis B)."""
    import jax
    return jax.tree_util.tree_map(lambda *x: np.stack(x), *samples)


class HostLoader:
    """Shuffling, thread-prefetching loader over a BOPObjectDataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 num_threads: int = 4, prefetch: int = 2, **sample_kw):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.sample_kw = sample_kw
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        epoch = self.epoch
        self.epoch += 1
        rng = np.random.default_rng(self.seed + epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        n_batches = len(self)
        batches = [order[b * self.batch_size:(b + 1) * self.batch_size]
                   for b in range(n_batches)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def sample_one(idx):
            from .dataset import SampleDropped
            # per-sample Generator: numpy Generators are not thread-safe,
            # and a shared one would also make augmentation depend on
            # thread interleaving — this keeps every sample deterministic
            # given (seed, epoch, frame index)
            rng_i = np.random.default_rng((self.seed, epoch, int(idx)))
            for attempt in range(8):
                try:
                    cad, pc, obj = self.dataset[int(idx)]
                    return make_sample(cad, pc, obj, rng=rng_i,
                                       **self.sample_kw)
                except SampleDropped:
                    # dataset self-healed; substitute a neighboring sample
                    idx = (int(idx) + 1) % max(len(self.dataset), 1)
            raise RuntimeError("too many dropped samples in a row")

        def producer():
            from concurrent.futures import ThreadPoolExecutor
            try:
                with ThreadPoolExecutor(
                        max_workers=self.num_threads) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        q.put(collate(list(pool.map(sample_one, idxs))))
            except BaseException as e:  # surface in the consumer: a
                q.put(e)                # swallowed error would silently
            finally:                    # truncate the epoch
                q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
