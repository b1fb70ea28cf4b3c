"""Patient-specific knowledge retrieval: exact top-k similarity search on device.

Capability parity: EVOKE's PretrainTester (modules/multiview/trainer.py:518-843):
encode every train image with the Stage-1 model (flattened token embeddings,
d = output_dim x (1+49)), build a FAISS IndexIVFFlat inner-product index, search
top-(k+10) per train/val/test image, drop same-study hits, and write
{sk_ids, reports, sk_keywords} into an augmented annotation JSON
(..._best_reports_keywords_{topk}.json).

TPU-native replacement for FAISS (SURVEY §2.12): EXACT top-k as a jitted
chunked matmul + jax.lax.top_k with a streaming merge — no approximate IVF
needed; a [Q_chunk, D] x [D, N_chunk] matmul saturates the MXU, and exactness
removes FAISS's recall/nprobe tuning. Database chunks stream HBM-sized; a
running top-k buffer merges per chunk.
"""

from __future__ import annotations

import hashlib
import os
import json
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def stable_code(key: str) -> int:
    """Process-independent 63-bit study code (sha1-based).

    Python's ``hash()`` is salted per process, which would silently break
    same-study exclusion for any saved/reloaded embedding DB and make index
    artifacts irreproducible across runs."""
    return int.from_bytes(hashlib.sha1(key.encode()).digest()[:8], "big") & 0x7FFFFFFFFFFFFFFF


@partial(jax.jit, static_argnames=("k",))
def _chunk_topk(queries, db_chunk, chunk_start, best_scores, best_idx, k: int,
                query_study, db_study_chunk):
    """Merge top-k of (queries @ db_chunk.T) into the running (best_scores, best_idx).

    Same-study database entries are masked out (the reference drops them
    post-search, multiview/trainer.py:590-609; masking pre-merge is equivalent
    and keeps the buffer dense).
    """
    sims = jnp.einsum("qd,nd->qn", queries, db_chunk,
                      preferred_element_type=jnp.float32)
    same = query_study[:, None] == db_study_chunk[None, :]
    sims = jnp.where(same, NEG_INF, sims)
    scores, idx = jax.lax.top_k(sims, min(k, db_chunk.shape[0]))
    idx = idx + chunk_start
    merged_scores = jnp.concatenate([best_scores, scores], axis=1)
    merged_idx = jnp.concatenate([best_idx, idx], axis=1)
    new_scores, pos = jax.lax.top_k(merged_scores, k)
    new_idx = jnp.take_along_axis(merged_idx, pos, axis=1)
    return new_scores, new_idx


class TopKIndex:
    """Exact inner-product top-k over a host-resident database, computed on device."""

    def __init__(self, embeddings: np.ndarray, study_codes: np.ndarray,
                 ids: Sequence[str], chunk_size: int = 4096):
        assert embeddings.shape[0] == len(ids) == study_codes.shape[0]
        self.db = embeddings
        self.study_codes = study_codes.astype(np.int64)
        self.ids = list(ids)
        self.chunk_size = chunk_size

    def search(self, queries: np.ndarray, query_study_codes: np.ndarray, k: int,
               query_chunk: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        """-> (scores [Q, k], indices [Q, k]) excluding same-study entries."""
        n = self.db.shape[0]
        k = min(k, n)
        out_scores, out_idx = [], []
        for qs in range(0, queries.shape[0], query_chunk):
            q = jnp.asarray(queries[qs:qs + query_chunk], jnp.float32)
            qc = jnp.asarray(query_study_codes[qs:qs + query_chunk])
            best_s = jnp.full((q.shape[0], k), NEG_INF, jnp.float32)
            best_i = jnp.zeros((q.shape[0], k), jnp.int32)
            for start in range(0, n, self.chunk_size):
                chunk = jnp.asarray(self.db[start:start + self.chunk_size], jnp.float32)
                codes = jnp.asarray(self.study_codes[start:start + self.chunk_size])
                best_s, best_i = _chunk_topk(q, chunk, start, best_s, best_i, k, qc, codes)
            out_scores.append(np.asarray(best_s))
            out_idx.append(np.asarray(best_i))
        return np.concatenate(out_scores), np.concatenate(out_idx)


def encode_corpus(encode_fn, loader, flatten: bool = True
                  ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Run a jitted encode_fn(batch) -> [n_anchor, T, D] over a loader; returns
    (embeddings [N, T*D], study_codes [N], ids [N]). study codes are hashes of
    the study key (collision-safe enough for exclusion masking)."""
    embs, codes, ids = [], [], []
    for batch in loader:
        out = np.asarray(encode_fn(batch))
        n_anchor = len(batch["_image_ids"])
        for i in range(n_anchor):
            if not batch["valid"][i]:
                continue
            e = out[i]
            embs.append(e.reshape(-1) if flatten else e)
            ids.append(batch["_image_ids"][i])
            codes.append(stable_code(batch["_study_keys"][i])
                         if "_study_keys" in batch else stable_code(batch["_image_ids"][i]))
    return np.stack(embs), np.asarray(codes, np.int64), ids


def attach_specific_knowledge(ann: Dict[str, List[dict]], split: str,
                              results_ids: Dict[str, List[str]],
                              id_to_item: Dict[str, dict], topk: int) -> None:
    """Write {sk_ids, reports, sk_keywords} into ann[split] items in place
    (the reference's get_specific_knowledge output contract,
    multiview/trainer.py:768-804)."""
    for item in ann[split]:
        iid = str(item["id"])
        hits = results_ids.get(iid, [])[:topk]
        item["specific_knowledge"] = {
            "sk_ids": hits,
            "reports": [id_to_item[h]["report"] for h in hits if h in id_to_item],
            "sk_keywords": [id_to_item[h].get("core_findings", [])
                            for h in hits if h in id_to_item],
        }


def build_knowledge_annotation(ann_path: str, out_path: str, splits: Sequence[str],
                               results_by_split: Dict[str, Dict[str, List[str]]],
                               topk: int) -> str:
    with open(ann_path) as f:
        ann = json.load(f)
    id_to_item = {str(it["id"]): it for it in ann.get("train", [])}
    for split in splits:
        attach_specific_knowledge(ann, split, results_by_split[split], id_to_item, topk)
    with open(out_path, "w") as f:
        json.dump(ann, f)
    return out_path


def retrieval_quality(ann: Dict[str, List[dict]], split: str,
                      id_to_item: Dict[str, dict], topk: int = 5) -> Dict[str, float]:
    """Re-score retrieved reports against each query's ground truth
    (PretrainTestAnalysis parity, EVOKE modules/utils.py:611-721): mean BLEU-4
    and ROUGE-L of the best and mean-of-top-k retrieved reports — a quality
    check of the Stage-1 embedding space before committing to Stage 2."""
    from evoke_tpu.evals.nlg import bleu, rouge_l

    gts, best_res, all_pairs = {}, {}, []
    for item in ann[split]:
        sk = item.get("specific_knowledge") or {}
        reports = [r for r in sk.get("reports", [])[:topk] if r]
        if not reports or not item.get("report"):
            continue
        iid = str(item["id"])
        gts[iid] = [item["report"]]
        best_res[iid] = [reports[0]]
        for r in reports:
            all_pairs.append((item["report"], r))
    if not gts:
        return {"n_scored": 0.0}
    b_best, _ = bleu(gts, best_res, 4)
    r_best, _ = rouge_l(gts, best_res)
    mean_gts = {i: [g] for i, (g, _) in enumerate(all_pairs)}
    mean_res = {i: [r] for i, (_, r) in enumerate(all_pairs)}
    b_all, _ = bleu(mean_gts, mean_res, 4)
    return {"n_scored": float(len(gts)), "retrieved_top1_BLEU_4": b_best[3],
            "retrieved_top1_ROUGE_L": r_best,
            "retrieved_topk_mean_BLEU_4": b_all[3]}


def plot_topk_images(ann: Dict[str, List[dict]], split: str,
                     id_to_item: Dict[str, dict], image_dir: str, out_dir: str,
                     topk: int = 3, n_studies: int = 10,
                     db_image_dir: Optional[str] = None, seed: int = 0
                     ) -> List[str]:
    """Render retrieved-neighbor grids for visual inspection (the reference's
    ``PretrainTestAnalysis.show_topk_images`` + ``plot_images``,
    modules/utils.py:611-721): for ``n_studies`` randomly sampled studies of
    ``split`` that carry ``specific_knowledge``, write a 2x2 JPEG/PNG grid —
    the anchor image (with the top-1 retrieved report's BLEU-4/ROUGE-L vs the
    study's own report drawn on it, the reference's re-scoring title) plus the
    top-``topk`` retrieved images. PIL instead of matplotlib (the repo's
    heatmap convention, evals/heatmaps.py); the re-scoring uses the NLG
    scorers rather than the reference's CE stack (env-gated here — the CE
    variant lives behind evals/adapters.py). Returns the written paths.
    """
    import numpy as np
    from PIL import Image, ImageDraw

    from evoke_tpu.evals.nlg import bleu, rouge_l

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    items = [it for it in ann.get(split, [])
             if (it.get("specific_knowledge") or {}).get("sk_ids")
             and it.get("image_path")]
    if not items:
        return []
    pick = rng.permutation(len(items))[:n_studies]
    tile = 256
    written = []
    for i in pick:
        item = items[int(i)]
        sk = item["specific_knowledge"]
        hits = [h for h in sk["sk_ids"][:topk] if h in id_to_item]
        paths = [(os.path.join(image_dir, item["image_path"][0]), None)]
        paths += [(os.path.join(db_image_dir or image_dir,
                                id_to_item[h]["image_path"][0]), h) for h in hits]
        # reference title: similarity of the study's report to its retrieved
        # reports (temp_compute_scores, utils.py:611-614)
        title = "no report"
        if item.get("report") and sk.get("reports"):
            g = {"0": [item["report"]]}
            r = {"0": [sk["reports"][0]]}
            b4, _ = bleu(g, r, 4)
            rl, _ = rouge_l(g, r)
            title = f"top1 bleu4:{b4[3]:.3f} rouge_l:{rl:.3f}"
        canvas = Image.new("RGB", (2 * tile, 2 * tile), (0, 0, 0))
        for j, (path, _) in enumerate(paths[:4]):
            try:
                img = Image.open(path).convert("RGB").resize((tile, tile))
            except OSError:
                img = Image.new("RGB", (tile, tile), (40, 40, 40))
            canvas.paste(img, ((j % 2) * tile, (j // 2) * tile))
        draw = ImageDraw.Draw(canvas)
        draw.rectangle([0, 0, 2 * tile, 14], fill=(0, 0, 0))
        draw.text((2, 2), title, fill=(255, 255, 0))
        out = os.path.join(out_dir,
                           f"{split}_{item['id']}_specific_knowledge.png")
        canvas.save(out)
        written.append(out)
    return written
