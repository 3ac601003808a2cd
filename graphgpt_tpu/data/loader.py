"""Host-side input pipeline: parallel tokenization workers + prefetch.

TPU-first replacement for the reference's torch DataLoader worker-process
tokenization (src/training/pretrain_mode.py:377-388, collator.py): a process
pool tokenizes graph index chunks ahead of the train loop, packs/pads to
static shapes, and a background thread keeps a prefetch queue full so the
device never waits on the host.

Determinism: worker tokenization RNG is seeded per (seed, epoch, idx), so a
run is reproducible regardless of worker count or scheduling.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np

from .collator import Batch, collate, pack_samples
from .tokenizer import TokenizedSample

_WORKER_STATE = {}


def _init_worker(dataset, tokenizer, seed):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["tokenizer"] = tokenizer
    _WORKER_STATE["seed"] = seed


def _tokenize_chunk(args):
    epoch, start_pos, idx_chunk = args
    ds = _WORKER_STATE["dataset"]
    tok = _WORKER_STATE["tokenizer"]
    seed = _WORKER_STATE["seed"]
    out = []
    # seeding includes the epoch position so a repeated index (contrastive
    # duplication, reference get_cl_sampler loader_utils.py:308-315) yields
    # an independent augmentation view
    for j, idx in enumerate(idx_chunk):
        rng = np.random.default_rng((seed, epoch, int(idx), start_pos + j))
        out.append(tok(ds[int(idx)], rng))
    return out


class GraphTokenLoader:
    """Iterates device-ready batches for one epoch.

    pack_to > 0 enables sequence packing to fixed rows of that length
    (recommended on TPU: one static shape, ~90+% token utilisation).
    Otherwise batches are bucket-padded to multiples of `bucket`.
    """

    def __init__(
        self,
        dataset,
        tokenizer,
        batch_size: int,
        mpe: int = 1024,
        pack: bool = True,
        bucket: int = 64,
        num_workers: int = 0,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 4,
        post_pack_fn=None,
        fixed_length: Optional[int] = None,
        pack_block: int = 0,
    ):
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.mpe = mpe
        self.pack = pack
        self.bucket = bucket
        # multi-host: unpacked batches must pad to ONE fixed length — with
        # per-host bucketing each process could pick a different bucket and
        # the global batch assembly would mix shapes across processes
        self.fixed_length = fixed_length
        self.pack_block = pack_block
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # post_pack_fn(sample, rng) -> sample; applied per packed row (e.g.
        # single-draw SMTP masking, reference tokenizer_utils.py:282-325)
        self.post_pack_fn = post_pack_fn
        self._pool = None

    def _ensure_pool(self):
        if self.num_workers > 0 and self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers,
                initializer=_init_worker,
                initargs=(self.dataset, self.tokenizer, self.seed),
            )
        return self._pool

    def _sample_stream(self, indices: np.ndarray, epoch: int) -> Iterator[TokenizedSample]:
        chunk = 32
        chunks = [
            (epoch, i, indices[i : i + chunk]) for i in range(0, len(indices), chunk)
        ]
        pool = self._ensure_pool()
        if pool is None:
            _init_worker(self.dataset, self.tokenizer, self.seed)
            for c in chunks:
                yield from _tokenize_chunk(c)
        else:
            for res in pool.imap(_tokenize_chunk, chunks, chunksize=1):
                yield from res

    def epoch_batches(
        self,
        indices: np.ndarray,
        epoch: int = 0,
        pack: Optional[bool] = None,
        fixed_length: Optional[int] = None,
        drop_last: Optional[bool] = None,
        batch_size: Optional[int] = None,
    ) -> Iterator[Batch]:
        """Batches for one pass over `indices`.

        `pack`/`fixed_length`/`drop_last` override the loader defaults —
        multi-host eval needs unpacked fixed-shape batches so every process
        emits the same batch count and global shape, and eval passes must
        keep the final partial batch (drop_last=False) to cover the full
        index set.
        """
        use_pack = self.pack if pack is None else pack
        use_drop_last = self.drop_last if drop_last is None else drop_last
        bs = batch_size or self.batch_size
        stream = self._sample_stream(indices, epoch)
        if use_pack:
            stream = pack_samples(stream, self.mpe, block=self.pack_block)
            if self.post_pack_fn is not None:
                rng = np.random.default_rng((self.seed, epoch, 777))
                stream = (self.post_pack_fn(s, rng) for s in stream)
        flen = (
            fixed_length
            if fixed_length is not None
            else (self.mpe if use_pack else self.fixed_length)
        )
        buf: List[TokenizedSample] = []
        for s in stream:
            buf.append(s)
            if len(buf) == bs:
                yield collate(buf, mpe=self.mpe, bucket=self.bucket, fixed_length=flen)
                buf = []
        if buf and not use_drop_last:
            yield collate(buf, mpe=self.mpe, bucket=self.bucket, fixed_length=flen)

    def prefetched(self, indices: np.ndarray, epoch: int = 0) -> Iterator[Batch]:
        """Background-thread prefetch of epoch_batches."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            try:
                for b in self.epoch_batches(indices, epoch):
                    q.put(b)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None


def estimate_tokens_per_sample(dataset, tokenizer, n: int = 256, seed: int = 0) -> float:
    """Sampled estimate (reference estimate_tokens_per_sample,
    misc_utils.py:349-378). Single-host: every host sampling the same seed
    over the same dataset agrees; for per-host-sharded corpora use
    estimate_tokens_per_sample_global."""
    rng = np.random.default_rng(seed)
    n = min(n, len(dataset))
    idx = rng.choice(len(dataset), size=n, replace=False)
    total = 0
    for i in idx:
        total += tokenizer(dataset[int(i)], rng).seq_len
    return total / n


def estimate_tokens_per_sample_global(
    dataset, tokenizer, n: int = 256, seed: int = 0
) -> float:
    """Cross-host-consistent estimate: every process samples its local shard
    and the per-host (sum, count) pairs are all-gathered so all hosts derive
    the SAME step schedule (the reference all_gathers sampled lengths,
    misc_utils.py:349-378). Degenerates to the local estimate on 1 process."""
    import jax

    local_n = min(n, len(dataset))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(dataset), size=local_n, replace=False) if local_n else []
    total = float(sum(tokenizer(dataset[int(i)], rng).seq_len for i in idx))
    if jax.process_count() == 1:
        return total / max(local_n, 1)
    from jax.experimental import multihost_utils

    pair = np.asarray([total, float(local_n)], np.float64)
    gathered = multihost_utils.process_allgather(pair)  # [n_proc, 2]
    sums = np.sum(gathered, axis=0)
    return float(sums[0] / max(sums[1], 1.0))
