"""Command-line entry point: ``python -m evoke_tpu.cli <task> [--key value ...]``.

Capability parity: EVOKE's main_224.py / main_384.py + run scripts surface —
tasks pretrain | finetune | test | retrieve | score | serve, argparse-over-YAML config,
result-dir layout results/{data}/{task}/{version}, same CSV/log artifacts.
Resolution (224 vs 384) is a config knob (model.image_size), not a separate
entry point.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np


def build_model(cfg, vocab_size: int, task: str):
    import jax.numpy as jnp

    from evoke_tpu.models.finetune import FinetuneModel
    from evoke_tpu.models.pretrain import PretrainModel

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.model.dtype]
    common = dict(
        vocab_size=vocab_size, d_vf=cfg.model.d_vf, output_dim=cfg.model.output_dim,
        encoder_hidden_size=cfg.model.encoder_hidden_size,
        encoder_num_layers=cfg.model.encoder_num_hidden_layers,
        encoder_num_heads=cfg.model.encoder_num_heads,
        encoder_intermediate_size=cfg.model.encoder_intermediate_size,
        proj_num_heads=cfg.model.proj_num_heads,
        fusion_wide_qkv=cfg.model.fusion_wide_qkv,
        fusion_max_partners=cfg.model.fusion_max_partners,
        remat_visual=cfg.model.remat_visual,
        is_multiview_learning=cfg.model.is_multiview_learning, dtype=dtype)
    if task == "pretrain":
        return PretrainModel(instance_temp=cfg.loss.instance_temp,
                             region_temp=cfg.loss.region_temp,
                             pretrain_loss=cfg.loss.pretrain_loss,
                             mul_pos_formulation=cfg.loss.mul_pos_formulation,
                             mask_local_pad=cfg.loss.mask_local_pad, **common)
    return FinetuneModel(
        fusion_num_heads=cfg.model.fusion_num_heads,
        fusion_intermediate_size=cfg.model.fusion_intermediate_size,
        sk_fusion_num_layers=cfg.model.sk_fusion_num_layers,
        d_model=cfg.model.d_model, d_ff=cfg.model.d_ff, num_heads=cfg.model.num_heads,
        num_layers=cfg.model.num_layers, dropout=cfg.model.dropout,
        drop_prob_lm=cfg.model.drop_prob_lm, rm_num_slots=cfg.model.rm_num_slots,
        rm_num_heads=cfg.model.rm_num_heads, rm_d_model=cfg.model.rm_d_model,
        max_seq_len=cfg.data.max_seq_len, **common)


def build_loaders(cfg, tokenizer, ann, task: str):
    from evoke_tpu.data.batching import MultiviewBatcher
    from evoke_tpu.data.datasets import parse_finetune, parse_pretrain
    from evoke_tpu.data.transforms import make_transform

    size = cfg.model.image_size
    u8 = cfg.data.images_uint8
    n_anchor = cfg.data.batch_size
    common = dict(n_anchor=n_anchor, max_seq_len=cfg.data.max_seq_len,
                  image_dir=cfg.data.image_dir, num_workers=cfg.data.num_workers)
    if task == "pretrain":
        mk = lambda split, train: MultiviewBatcher(
            parse_pretrain(ann, split, cfg.data.align_type),
            tokenizer, make_transform(size, train, output_uint8=u8), shuffle=train,
            multiview=cfg.model.is_multiview_learning, **common)
        return {"train": mk("train", True), "val": mk("val", False),
                "test": mk("test", False)}
    out = {}
    for split in ("train", "val", "test"):
        has_ind, no_ind = parse_finetune(ann, split)
        train = split == "train" and task == "finetune"
        tf = make_transform(size, train, output_uint8=u8)
        mk = lambda exs, with_ind: (MultiviewBatcher(
            exs, tokenizer, tf, shuffle=train, with_indication=with_ind,
            text_field="report", add_bos_eos=True,
            multiview=cfg.model.is_multiview_learning, **common) if exs else None)
        inc = mk(has_ind, True) if cfg.model.is_add_indication else None
        no = mk(no_ind + ([] if cfg.model.is_add_indication else has_ind), False)
        out[split] = (inc, no)
    return out


def init_finetune_state(cfg, model, loaders):
    import jax

    from evoke_tpu.train.optim import build_optimizer
    from evoke_tpu.train.steps import create_train_state

    loader = loaders["train"][0] or loaders["train"][1]
    b0 = next(iter(loader))
    inc_ids = b0.get("inc_ids", b0["ids"])
    inc_mask = b0.get("inc_mask", b0["mask"])
    variables = jax.jit(lambda *a: model.init(*a, method=model.warmup))(
        jax.random.key(cfg.trainer.seed), b0["images"], b0["ids"], b0["mask"],
        b0["pids"], b0["valid"], inc_ids, inc_mask)
    tx = build_optimizer(cfg.optim.optim, "finetune", variables["params"],
                         pt_lr=cfg.optim.pt_lr, ft_lr=cfg.optim.ft_lr,
                         weight_decay=cfg.optim.weight_decay,
                         grad_clip_value=cfg.optim.grad_clip_value,
                         grad_accum_steps=cfg.optim.grad_accum_steps)
    return create_train_state(variables, tx), tx


def init_pretrain_state(cfg, model, loaders):
    import jax

    from evoke_tpu.train.optim import build_optimizer
    from evoke_tpu.train.steps import create_train_state

    b0 = next(iter(loaders["train"]))
    variables = jax.jit(model.init)(jax.random.key(cfg.trainer.seed), b0["images"],
                                    b0["ids"], b0["mask"], b0["pids"], b0["valid"])
    tx = build_optimizer(cfg.optim.optim, "pretrain", variables["params"],
                         pt_lr=cfg.optim.pt_lr, ft_lr=cfg.optim.ft_lr,
                         weight_decay=cfg.optim.weight_decay,
                         grad_clip_value=cfg.optim.grad_clip_value,
                         grad_accum_steps=cfg.optim.grad_accum_steps)
    return create_train_state(variables, tx), tx


def metrics_fn_for(cfg):
    """NLG always; CE metrics only when their checkpoints/deps are available."""
    from evoke_tpu.evals.composite import compute_all_scores

    def fn(gts: Dict[str, List[str]], res: Dict[str, List[str]]) -> Dict[str, float]:
        return compute_all_scores(gts, res, cfg.metrics)

    return fn


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("tasks: pretrain | finetune | test | retrieve | score | serve")
        return 0
    task = argv[0]
    if task not in ("pretrain", "finetune", "test", "retrieve", "score", "serve"):
        print(f"unknown task {task!r}; "
              f"tasks: pretrain | finetune | test | retrieve | score | serve", file=sys.stderr)
        return 2
    from evoke_tpu.core.config import load_config

    yaml_path = None
    if "--config" in argv:
        i = argv.index("--config")
        yaml_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # serve keeps its own task name (results/{data}/serve/{version}) so a serve
    # run never shares a result directory with a real test run of the same
    # version; loader/model construction below treats it like test anyway.
    cfg_task = {"retrieve": "pretrain"}.get(task, task)
    cfg = load_config(yaml_path, overrides={"trainer.task": cfg_task}, argv=argv[1:])
    cfg.trainer.task = cfg_task

    if task == "score":
        return _score(cfg)

    from evoke_tpu.data.datasets import load_annotation
    from evoke_tpu.data.tokenizer import build_tokenizer

    ann = load_annotation(cfg.data.ann_path)
    tokenizer = build_tokenizer(cfg.data.tokenizer_dir, cfg.data.data_name,
                                ann_path=cfg.data.ann_path,
                                model=cfg.data.tokenizer_model,
                                tokenizer_type=cfg.data.tokenizer_type)
    cfg.vocab_size = tokenizer.get_vocab_size()
    model = build_model(cfg, cfg.vocab_size, "pretrain" if task in ("pretrain", "retrieve")
                        else "finetune")
    loaders = build_loaders(cfg, tokenizer, ann,
                            "pretrain" if task in ("pretrain", "retrieve") else cfg.trainer.task)

    from evoke_tpu.train.trainer import FinetuneTrainer, PretrainTrainer, Tester

    if task == "pretrain":
        state, tx = init_pretrain_state(cfg, model, loaders)
        trainer = PretrainTrainer(cfg, model, tokenizer, tx, state,
                                  train_loader=loaders["train"],
                                  val_loader=loaders["val"],
                                  test_loader=loaders["test"])
        trainer.train()
        return 0
    if task in ("finetune", "test"):
        state, tx = init_finetune_state(cfg, model, loaders)
        cls = FinetuneTrainer if task == "finetune" else Tester
        trainer = cls(cfg, model, tokenizer, tx, state,
                      train_loaders=loaders["train"],
                      eval_loaders={"val": loaders["val"], "test": loaders["test"]},
                      metrics_fn=metrics_fn_for(cfg))
        if task == "finetune":
            trainer.train()
        else:
            trainer.test()
            if cfg.trainer.plot_heatmaps > 0:
                _plot_heatmaps(cfg, model, tokenizer, loaders, trainer.state)
        return 0
    if task == "retrieve":
        return _retrieve(cfg, model, tokenizer, ann, loaders)
    if task == "serve":
        state, _ = init_finetune_state(cfg, model, loaders)
        return _serve(cfg, model, tokenizer, loaders, state)
    print(f"unknown task {task!r}", file=sys.stderr)
    return 2


def _serve(cfg, model, tokenizer, loaders, state) -> int:
    """Production-style streaming inference over the test split: pipelined
    beam decode (bounded in-flight depth), predictions CSV + throughput stats.
    Unlike ``test`` this runs no metric scoring — it is the serving path."""
    import csv

    from evoke_tpu.core.checkpoint import CheckpointManager
    from evoke_tpu.serve import ReportServer

    if cfg.trainer.load:
        mgr = CheckpointManager(os.path.dirname(cfg.trainer.load) or ".")
        merged, report = mgr.partial_restore_from(cfg.trainer.load, state.params)
        state = state.replace(params=merged)
        print(f"loaded weights: {report}")
    # --decode.serve_dp N: pure-dp serving mesh — slots/batches shard over
    # 'dp', the Pallas kernels ride shard_map (ops/sharding.py, DESIGN 5r)
    mesh = None
    if cfg.decode.serve_dp:
        import jax

        from evoke_tpu.core.mesh import MeshSpec, create_mesh

        n = len(jax.devices()) if cfg.decode.serve_dp < 0 else cfg.decode.serve_dp
        mesh = create_mesh(MeshSpec(dp=n))
        print(f"serving mesh: dp={n}")
    records: List[Dict] = []
    stats: List[Dict[str, float]] = []
    inc, no = loaders["test"]
    if cfg.decode.engine == "continuous":
        from evoke_tpu.decode.continuous import ContinuousServer

        server = ContinuousServer(
            model, tokenizer, state, max_seq_len=cfg.data.max_seq_len,
            slots=cfg.decode.slots, beam_size=cfg.decode.beam_size,
            seg_steps=cfg.decode.seg_steps,
            dispatch_segs=cfg.decode.dispatch_segs,
            pack_batches=cfg.decode.pack_batches,
            suppress_unk=cfg.decode.suppress_unk,
            length_penalty=cfg.decode.length_penalty,
            beam_kv=cfg.decode.beam_kv,
            kv_cache_dtype=cfg.decode.kv_cache_dtype, mesh=mesh)
        for loader in (inc, no):
            if loader is None:
                continue
            recs, st = server.serve(loader, prefetch=cfg.data.prefetch)
            records.extend(recs)
            stats.append(st)
    else:
        server = ReportServer(model, tokenizer, state, cfg.decode,
                              max_seq_len=cfg.data.max_seq_len, mesh=mesh)
        for loader, with_ind in ((inc, True), (no, False)):
            if loader is None:
                continue
            records.extend(server.serve(loader, with_indication=with_ind))
            stats.append(dict(server.stats))
    os.makedirs(cfg.result_dir, exist_ok=True)
    out_path = os.path.join(cfg.result_dir, "serve_prediction.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["images_id", "generated_reports", "ground_truth"])
        for r in records:
            w.writerow([r["id"], r["report"], r.get("gt", "")])
    wall = sum(s["wall_s"] for s in stats)
    summary = {
        "reports": int(sum(s["reports"] for s in stats)),
        "wall_s": round(wall, 3),
        "reports_per_s": round(sum(s["reports"] for s in stats) / wall, 3) if wall else None,
        "prediction_csv": out_path,
    }
    if cfg.trainer.plot_heatmaps > 0:
        _plot_heatmaps(cfg, model, tokenizer, loaders, state)
    print(json.dumps(summary))
    return 0


def _plot_heatmaps(cfg, model, tokenizer, loaders, state) -> None:
    """Render per-generated-token cross-attention overlays for the first N test
    studies (reference Tester.plot, modules/tester.py:94; heatmap math in
    evals/heatmaps.py)."""
    from evoke_tpu.evals.heatmaps import render_generation_heatmaps
    from evoke_tpu.train.steps import make_generate_step

    n = cfg.trainer.plot_heatmaps
    out_dir = os.path.join(cfg.result_dir, "attentions")
    written: List[str] = []
    inc, no = loaders["test"]
    for loader, with_ind in ((inc, True), (no, False)):
        if loader is None or n <= 0:
            continue
        batch = next(iter(loader))
        data = {k: v for k, v in batch.items() if not k.startswith("_")}
        gen = make_generate_step(model, tokenizer, cfg.decode, cfg.data.max_seq_len,
                                 with_indication=with_ind)
        seqs = np.asarray(gen(state, data))
        valid = np.asarray(batch["valid"])[: seqs.shape[0]]
        take = min(n, int(valid.sum()))
        written += render_generation_heatmaps(
            model, state, batch, seqs, tokenizer, out_dir, cfg.model.num_layers,
            study_ids=list(batch["_image_ids"]), max_studies=take,
            with_indication=with_ind)
        n -= take
    print(f"wrote {len(written)} heatmap PNGs to {out_dir}")


def _score(cfg) -> int:
    """Score a predictions file: JSON {id: text} pairs or a test_prediction.csv."""
    from evoke_tpu.evals.nlg import compute_nlg_scores

    path = cfg.data.ann_path  # reuse --ann_path for the predictions file
    if path.endswith(".csv"):
        import pandas as pd
        df = pd.read_csv(path, dtype=str)
        # drop metric rows: ours are tagged __metric__, the reference's have
        # an empty ground_truth column
        df = df[~df["images_id"].astype(str).str.startswith("__metric__")]
        df = df[~df["ground_truth"].isna()]
        pred_cols = [c for c in df.columns if c.startswith("pred_")]
        pred_col = pred_cols[-1] if pred_cols else "generated_reports"
        gts = {r["images_id"]: [str(r["ground_truth"])] for _, r in df.iterrows()}
        res = {r["images_id"]: [str(r[pred_col])] for _, r in df.iterrows()}
    else:
        blob = json.loads(open(path).read())
        gts = {k: [v] for k, v in blob["gts"].items()}
        res = {k: [v] for k, v in blob["res"].items()}
    print(json.dumps(compute_nlg_scores(gts, res), indent=2))
    return 0


def _retrieve(cfg, model, tokenizer, ann, loaders) -> int:
    """Stage-1.5: build the specific-knowledge annotation via on-device top-k."""
    import jax

    from evoke_tpu.core.checkpoint import CheckpointManager
    from evoke_tpu.retrieval.topk import (TopKIndex, build_knowledge_annotation,
                                          stable_code)
    from evoke_tpu.train.optim import build_optimizer
    from evoke_tpu.train.steps import create_train_state

    state, tx = init_pretrain_state(cfg, model, loaders)
    if cfg.trainer.load:
        mgr = CheckpointManager(os.path.dirname(cfg.trainer.load) or ".")
        merged, report = mgr.partial_restore_from(cfg.trainer.load, state.params)
        state = state.replace(params=merged)
        print(f"loaded stage-1 weights: {report}")

    from evoke_tpu.train.steps import maybe_normalize_images

    @jax.jit
    def encode(batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = maybe_normalize_images(batch)
        n_anchor = batch["ids"].shape[0]
        proj, _ = model.apply(variables, batch["images"], batch["pids"], batch["valid"],
                              n_anchor, train=False, method=model.encode_images)
        return proj

    def corpus(loader):
        embs, codes, ids = [], [], []
        for batch in loader:
            strip = {k: v for k, v in batch.items() if not k.startswith("_")}
            out = np.asarray(encode(strip))
            for i, iid in enumerate(batch["_image_ids"]):
                if not batch["valid"][i]:
                    continue
                embs.append(out[i].reshape(-1).astype(np.float16))
                codes.append(stable_code(iid))
                ids.append(iid)
        return np.stack(embs), np.asarray(codes, np.int64), ids

    # cross-corpus mode (SURVEY §2.8): build the db from another corpus's train
    # split (e.g. IU X-ray queries against MIMIC train)
    db_ann_path = cfg.data.retrieve_db_ann_path or cfg.data.ann_path
    if cfg.data.retrieve_db_ann_path:
        from evoke_tpu.data.batching import MultiviewBatcher
        from evoke_tpu.data.datasets import load_annotation as _load
        from evoke_tpu.data.datasets import parse_pretrain as _pp
        from evoke_tpu.data.transforms import make_transform as _mt
        db_ann = _load(db_ann_path)
        db_loader = MultiviewBatcher(
            _pp(db_ann, "train", cfg.data.align_type), tokenizer,
            _mt(cfg.model.image_size, False, output_uint8=cfg.data.images_uint8),
            n_anchor=cfg.data.batch_size, max_seq_len=cfg.data.max_seq_len,
            image_dir=cfg.data.retrieve_db_image_dir or cfg.data.image_dir,
            num_workers=cfg.data.num_workers,
            multiview=cfg.model.is_multiview_learning)
    else:
        db_loader = loaders["train"]

    db_emb, db_codes, db_ids = corpus(db_loader)
    index = TopKIndex(db_emb.astype(np.float32), db_codes, db_ids)
    topk = cfg.data.retrieve_topk
    results = {}
    same_corpus = not cfg.data.retrieve_db_ann_path
    for split in ("train", "val", "test"):
        q_emb, q_codes, q_ids = (db_emb, db_codes, db_ids)             if (split == "train" and same_corpus) else corpus(loaders[split])
        _, idx = index.search(q_emb.astype(np.float32), q_codes, topk)
        results[split] = {qid: [db_ids[j] for j in row] for qid, row in zip(q_ids, idx)}
    out_path = cfg.data.ann_path.replace(
        ".json", f"_best_reports_keywords_{topk}.json")
    # knowledge reports/keywords come from the DB corpus's train items
    import json as _json
    from evoke_tpu.retrieval.topk import attach_specific_knowledge
    with open(cfg.data.ann_path) as f:
        target_ann = _json.load(f)
    with open(db_ann_path) as f:
        db_items = _json.load(f).get("train", [])
    id_to_item = {str(it["id"]): it for it in db_items}
    for split in ("train", "val", "test"):
        attach_specific_knowledge(target_ann, split, results[split], id_to_item, topk)
    with open(out_path, "w") as f:
        _json.dump(target_ann, f)
    print(f"wrote {out_path}")
    if cfg.data.retrieve_plot > 0:
        from evoke_tpu.retrieval.topk import plot_topk_images

        plot_dir = os.path.join(cfg.result_dir, "sk_analysis")
        for split in ("train", "val", "test"):
            wrote = plot_topk_images(
                target_ann, split, id_to_item, cfg.data.image_dir, plot_dir,
                topk=min(topk, 3), n_studies=cfg.data.retrieve_plot,
                db_image_dir=cfg.data.retrieve_db_image_dir or None)
            print(f"wrote {len(wrote)} {split} retrieval grids to {plot_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
