"""Host data loader: deterministic epoch shuffling, numpy batch collation,
mesh-divisible padding, threaded prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stack
(datasets/build_datasets.py:51-310, collate_funcs.py): every batch is a dict
of fixed-shape numpy arrays ready for `shard_batch` onto the mesh; the
`set_epoch`/seeded-shuffle semantics of DistributedSampler are reproduced by
deriving the permutation from (seed, epoch).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator

import numpy as np

from .dataset import P3Dataset


def collate(items: list[dict]) -> dict:
    out: dict = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        out[k] = np.stack(vals) if np.ndim(vals[0]) > 0 else np.asarray(vals)
    return out


class Loader:
    def __init__(
        self,
        dataset: P3Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 42,
        pad_to_batch: bool = True,
        num_workers: int = 0,
        prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_to_batch = pad_to_batch
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.epoch = 0
        # DistributedSampler semantics (build_datasets.py:95,145,195): each
        # process iterates a disjoint wrap-padded 1/process_count slice of the
        # epoch-shuffled order. Defaults come from the jax runtime so
        # single-process behavior is unchanged.
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _num_local(self) -> int:
        n = len(self.dataset)
        if self.process_count <= 1:
            return n
        return (n + self.process_count - 1) // self.process_count

    def __len__(self) -> int:
        n = self._num_local()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idxs)
        if self.process_count > 1:
            per = self._num_local()
            total = per * self.process_count
            if total > len(idxs):  # wrap-pad like DistributedSampler
                idxs = np.concatenate([idxs, idxs[: total - len(idxs)]])
            idxs = idxs[self.process_index :: self.process_count]
        return idxs

    def _make_batch(self, batch_idxs: np.ndarray) -> dict:
        items = []
        for i in batch_idxs:
            rng = np.random.RandomState(
                (self.seed * 1_000_003 + self.epoch * 10_007 + int(i)) % (2**31)
            )
            items.append(self.dataset.get_item(int(i), rng))
        batch = collate(items)
        n = len(batch_idxs)
        if self.pad_to_batch and n < self.batch_size:
            # repeat-pad the final partial batch; mask via 'sample_valid'
            reps = np.concatenate([np.arange(n), np.zeros(self.batch_size - n, int)])
            batch = {k: v[reps] for k, v in batch.items()}
            valid = np.zeros((self.batch_size,), bool)
            valid[:n] = True
            batch["sample_valid"] = valid
        else:
            batch["sample_valid"] = np.ones((n,), bool)
        return batch

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        n_batches = len(self)
        slices = [
            order[b * self.batch_size : (b + 1) * self.batch_size] for b in range(n_batches)
        ]
        if self.num_workers <= 0:
            for s in slices:
                yield self._make_batch(s)
            return
        with cf.ThreadPoolExecutor(self.num_workers) as ex:
            futures: list = []
            it = iter(slices)
            for _ in range(self.prefetch):
                s = next(it, None)
                if s is not None:
                    futures.append(ex.submit(self._make_batch, s))
            while futures:
                batch = futures.pop(0).result()
                s = next(it, None)
                if s is not None:
                    futures.append(ex.submit(self._make_batch, s))
                yield batch


def build_loader(
    cfg, split: str, tokenizer=None, eval_mode: bool = False, batch_size: int | None = None
) -> Loader:
    """get_{train,val,test}_loader equivalent (build_datasets.py:26-49);
    eval_mode builds the test-transform loader for any split (prediction).
    `batch_size` overrides the model batch size (e.g. larger eval batches)."""
    from .synthetic import ensure_synthetic_dataset

    ensure_synthetic_dataset(cfg)
    ds = P3Dataset(cfg, split, tokenizer=tokenizer, eval_mode=eval_mode)
    train = split == "train" and not eval_mode
    return Loader(
        ds,
        batch_size=int(batch_size or cfg.experiment.model.batch_size),
        shuffle=train and cfg.run_type.name != "debug",
        drop_last=False,
        seed=int(cfg.get("seed", 42)),
        num_workers=int(cfg.get("num_workers", 0) or 0),
    )
