"""Static-shape multiview batching + threaded prefetch.

The reference's collate (dataloaders_v0401.py:60-116) builds dynamic-size batches
(bs anchors + a variable number of deduped auxiliary views) with PIL decode in
DataLoader workers. XLA needs static shapes, so here every batch is
[n_anchor + n_aux_slots] image slots:

- the first n_anchor slots are study anchors (aligned with the per-study texts);
- the next n_aux_slots hold deduped auxiliary views (padded with invalid slots;
  per-study aux views beyond capacity are dropped and COUNTED — never silent);
- pid codes are per-batch integers (padding slots get unique negative codes);
- text is padded to max_seq_len (not batch-max: one shape, one compilation).

Decode/transform runs in a thread pool; batches are prefetched ahead of the
device step (the reference's num_workers analogue, utils.py:83).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from evoke_tpu.data.datasets import Example
from evoke_tpu.data.transforms import ImageTransform, load_image
from evoke_tpu.data.tokenizer import WordTokenizer


class MultiviewBatcher:
    """Yields static-shape batches from a list of Examples."""

    def __init__(self, examples: Sequence[Example], tokenizer: WordTokenizer,
                 transform: ImageTransform, *, n_anchor: int, n_aux_slots: Optional[int] = None,
                 max_seq_len: int = 100, image_dir: str = "", shuffle: bool = False,
                 with_indication: bool = False, multiview: bool = True,
                 text_field: str = "align_text", add_bos_eos: bool = False,
                 seed: int = 0, num_workers: int = 8, drop_last: bool = False):
        self.examples = list(examples)
        self.tokenizer = tokenizer
        self.transform = transform
        self.n_anchor = n_anchor
        self.n_aux = n_aux_slots if n_aux_slots is not None else (n_anchor if multiview else 0)
        self.max_seq_len = max_seq_len
        self.image_dir = image_dir
        self.shuffle = shuffle
        self.with_indication = with_indication
        self.multiview = multiview
        self.text_field = text_field
        self.add_bos_eos = add_bos_eos
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.aux_dropped = 0  # running count of truncated aux views (never silent)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.examples)
        if self.drop_last:
            return n // self.n_anchor
        return (n + self.n_anchor - 1) // self.n_anchor

    def _encode_text(self, text: str) -> np.ndarray:
        return self.tokenizer.encode_padded(text, self.max_seq_len,
                                            add_bos_eos=self.add_bos_eos)

    def _build_batch(self, group: List[Example], rng: np.random.Generator,
                     pool: ThreadPoolExecutor) -> Dict[str, np.ndarray]:
        n_a, n_x = self.n_anchor, self.n_aux
        total = n_a + n_x
        s = self.transform.image_size
        img_dtype = np.uint8 if getattr(self.transform, "output_uint8", False) else np.float32
        images = np.zeros((total, s, s, 3), img_dtype)
        pids = np.arange(total, dtype=np.int32) * -1 - 1  # unique negatives by default
        valid = np.zeros(total, bool)
        ids = np.zeros((n_a, self.max_seq_len), np.int32)
        mask = np.zeros((n_a, self.max_seq_len), np.int32)
        inc_ids = np.zeros((n_a, self.max_seq_len), np.int32)
        image_ids: List[str] = [""] * n_a
        gts: List[str] = [""] * n_a

        # assign codes per study
        jobs = []  # (slot, path)
        aux_slot = n_a
        seen_info: Dict[str, int] = {}
        for i, ex in enumerate(group):
            pids[i] = i
            valid[i] = True
            image_ids[i] = ex.id
            gts[i] = ex.report
            text = getattr(ex, self.text_field)
            ids[i] = self._encode_text(text)
            if self.with_indication:
                inc_ids[i] = self.tokenizer.encode_padded(ex.indication, self.max_seq_len)
            jobs.append((i, ex.anchor_path))
            seen_info[ex.anchor_path] = i
            if self.multiview:
                for p in ex.aux_paths:
                    if p in seen_info:
                        continue  # dedup by image path (reference: patient_info)
                    if aux_slot >= total:
                        self.aux_dropped += 1
                        continue
                    seen_info[p] = aux_slot
                    pids[aux_slot] = i
                    valid[aux_slot] = True
                    jobs.append((aux_slot, p))
                    aux_slot += 1

        def work(slot_path):
            slot, path = slot_path
            img = load_image(path, self.image_dir)
            images[slot] = self.transform(img, rng=np.random.default_rng(
                rng.integers(0, 2**31)))

        list(pool.map(work, jobs))
        mask = (ids != self.tokenizer.pad_id).astype(np.int32)
        batch = {"images": images, "ids": ids, "mask": mask, "pids": pids, "valid": valid,
                 "_image_ids": image_ids, "_gts": gts}
        if self.with_indication:
            batch["inc_ids"] = inc_ids
            batch["inc_mask"] = (inc_ids != self.tokenizer.pad_id).astype(np.int32)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.examples))
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        if self.shuffle:
            rng.shuffle(order)
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), self.n_anchor):
                idx = order[start:start + self.n_anchor]
                if len(idx) < self.n_anchor and self.drop_last:
                    break
                group = [self.examples[i] for i in idx]
                yield self._build_batch(group, rng, pool)


def device_prefetch(batches, mesh=None, depth: int = 2):
    """Overlap host->device transfer with device compute.

    Yields (device_batch, host_extras) pairs; up to ``depth`` batches are
    device_put ahead of consumption (jax transfers are async, so the copy of
    batch N+1 rides along while step N runs). Private '_'-prefixed keys stay on
    host. This is the TPU answer to the reference's pinned-memory `.to(device,
    non_blocking=True)` per batch (trainer_v0401.py:259).
    """
    import collections

    import jax

    from evoke_tpu.core.mesh import shard_batch

    queue: "collections.deque" = collections.deque()

    def put(batch):
        host = {k: v for k, v in batch.items() if k.startswith("_")}
        data = {k: v for k, v in batch.items() if not k.startswith("_")}
        dev = shard_batch(data, mesh) if mesh is not None else jax.device_put(data)
        return dev, host

    for batch in batches:
        queue.append(put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class Prefetcher:
    """Background-thread prefetch of an iterable of batches."""

    def __init__(self, iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err: List[BaseException] = []

        def producer():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
