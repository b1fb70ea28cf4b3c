"""Typed configuration for evoke-tpu.

Mirrors the public hyperparameter surface of the reference (EVOKE's
``config/finetune_config.yaml`` + ``modules/utils.py:62-144 setup_arguments``),
re-expressed as typed dataclasses with YAML + CLI override. CLI wins over YAML,
YAML wins over defaults — the same precedence as the reference.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class ModelConfig:
    """Model dims (reference: config/finetune_config.yaml:14-66)."""

    # visual encoder
    visual_encoder: str = "resnet101"           # resnet101 | vit_b32
    image_size: int = 224                        # 224 or 384
    visual_pool: str = "avg7"                    # avg7 (224 path) | mean (384 path, ResNetTemp)
    d_vf: int = 2048                             # patch feature dim (ResNet-101 C5)
    resnet_checkpoint: str = ""                  # optional torchvision .pth to import

    # text encoder (SciBERT-style)
    text_checkpoint: str = ""                    # optional HF checkpoint to import
    encoder_hidden_size: int = 768
    encoder_num_hidden_layers: int = 6
    encoder_num_heads: int = 12
    encoder_intermediate_size: int = 3072

    # fusion (BertCrossLayer-style co-attention over image/indication tokens)
    fusion_num_heads: int = 8
    sk_fusion_num_layers: int = 1
    fusion_intermediate_size: int = 2048

    # text decoder (R2Gen-style)
    text_decoder: str = "r2gen"                  # r2gen | cmn
    d_model: int = 512
    d_ff: int = 512
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.0
    drop_prob_lm: float = 0.5
    logit_layers: int = 1
    use_bn: int = 0
    # relational memory
    rm_num_slots: int = 3
    rm_num_heads: int = 8
    rm_d_model: int = 512
    # CMN memory
    topk: int = 32
    cmm_size: int = 2048
    cmm_dim: int = 512

    # projection heads / contrastive embedding
    output_dim: int = 2048
    proj_num_heads: int = 8
    # multiview cross-attention per-head dim == d_model (reference
    # utils_v0511.py:210-281 dimensioning; False = standard d_model/h)
    fusion_wide_qkv: bool = True
    # static bound on same-study partner rows per anchor for the multiview
    # fusion attention: null = dense masked attention over the whole batch
    # (exact for any partner multiplicity); an int G runs grouped
    # partner-gather attention over (1+G)*T keys — identical output whenever
    # every anchor has <= G partners (models/fusion.py; check your data with
    # fusion.max_partners_in). MIMIC-CXR studies have <= 3 aux views after
    # dedup in practice; measured at 384 this is the difference between the
    # encoder attending 9280 vs 580 keys per anchor.
    fusion_max_partners: Optional[int] = None
    # jax.checkpoint the ResNet bottlenecks: backward recomputes block
    # activations instead of storing them (same math), lifting the
    # train-batch memory ceiling (96+96 @224 OOMs a v5e-1 without it)
    remat_visual: bool = False

    # multiview learning / indication fusion switches
    is_multiview_learning: bool = True
    is_add_indication: bool = True

    # compute dtype for the heavy path ("bfloat16" on TPU; tests use float32)
    dtype: str = "float32"


@dataclass
class DecodeConfig:
    """Report generation (reference: config/finetune_config.yaml:49-66)."""

    # beam_search | greedy | sample | gumbel | top_k | top_p — plus the
    # reference's string-encoded forms "topN": N >= 1 is top-k sampling with
    # k=N, 0 < N < 1 is nucleus sampling with p=N (caption_model.py:381-394)
    sample_method: str = "beam_search"
    beam_size: int = 3
    top_k: int = 0                               # top-k sampling cutoff (sample_method=top_k)
    top_p: float = 0.0                           # nucleus sampling cutoff (sample_method=top_p)
    length_penalty: str = ""                     # "" | "wu_X" | "avg_X"
    diversity_lambda: float = 0.5
    suppress_unk: bool = False
    temperature: float = 1.0
    group_size: int = 1
    sample_n: int = 1
    output_logsoftmax: bool = True
    decoding_constraint: bool = False
    block_trigrams: bool = True                 # applies to the greedy/sample path (as in the reference)
    # Cache-growth phases for KV-cached decoding: the loop's HBM traffic is
    # linear in cache length, so early steps run with a shorter cache that is
    # zero-padded mid-decode (exact math; see decode/beam.py grow_caches). 1 =
    # one full-length cache. >=2 splits max_seq_len evenly. Measured on v5e-1
    # (flagship @224, batch 32, beam 3): 436 -> 466 (2) -> 480 r/s (4).
    # 0 = auto: 1 on the test/eval path (differently-compiled segments round
    # differently on TPU bf16, flipping a few near-tie beams — eval outputs
    # stay bit-comparable across runs and to the reference), 8 on the serving
    # path (throughput; make_generate_step(serving=True) — re-swept under the
    # ancestor/Pallas serving default, train/steps.py).
    cache_phases: int = 0
    # Beam KV-cache bookkeeping: "reorder" gathers every [N, L, D] cache by
    # beam index each step (read+write); "ancestor" keeps caches un-permuted
    # and tracks lineages in a [B, beam, L] int32 table — the same attended
    # set (exact in f32; decode/beam.py, models/layers.py
    # cached_self_attention). On TPU the ancestor read runs as a Pallas
    # kernel (ops/lineage_attention.py): one HBM pass over each sample's
    # cache block per step instead of reorder's three. "auto" resolves to
    # ancestor for TPU SERVING (measured +4.5% @224 / +18.7% @384
    # steady-state, v5e-1 batch 32 beam 3 — DESIGN 5f; the round-2 XLA
    # formulation of ancestor mode had lost 43%) and to reorder for eval
    # paths (bit-comparable outputs across backends) and int8 caches.
    beam_kv: str = "auto"                        # auto | reorder | ancestor
    # KV-cache storage dtype for decoding: "" = the model compute dtype
    # (bf16 on TPU). "int8" stores the self-attn caches 8-bit with per-slot
    # absmax scales (models/layers.py quantized_cache_update) — half the cache
    # HBM traffic and memory, dequantized at the attend boundary. QUANTIZED
    # numerics (not bit-exact to bf16 caches): opt-in, serving-oriented;
    # only the R2Gen decoder implements it today.
    kv_cache_dtype: str = ""                     # "" | int8
    # Serving engine for the `serve` task: "batch" decodes loader batches to
    # completion (serve.ReportServer, pipelined depth-2); "continuous" keeps
    # the decode batch full across study boundaries — finished studies are
    # harvested at segment boundaries and their slots re-admitted from the
    # queue of pre-encoded studies (decode/continuous.py ring-cache engine).
    # Batch mode pays the SLOWEST study of every batch; with the real MIMIC
    # length mix continuous wins whenever generated lengths vary.
    engine: str = "batch"                        # batch | continuous
    slots: int = 64                              # continuous: decode slots (studies in flight)
    seg_steps: int = 10                          # continuous: decode steps between harvests
    # continuous: harvest->admit->decode segments run back-to-back per device
    # dispatch (admission stays on device; ONE host fetch per dispatch — the
    # remote-runtime RTT amortizer, decode/continuous.py)
    dispatch_segs: int = 4
    # continuous: loader batches fused per device-side admission pack; packs
    # must outlast the depth*dispatch_segs-segment admission lookahead or
    # slots starve around pack switches (decode/continuous.py make_fused)
    pack_batches: int = 4
    # Serving mesh: 0 = single device (default); N > 0 = a pure-dp mesh over
    # the first N visible devices; -1 = all visible devices. Batches and the
    # continuous engine's slots shard over 'dp' (slots and batch sizes must
    # divide by N), and BOTH Pallas serving kernels stay engaged through
    # shard_map (ops/sharding.py — measured at single-chip speed per device,
    # DESIGN 5r). Params replicate.
    serve_dp: int = 0


@dataclass
class LossConfig:
    instance_temp: float = 0.5
    region_temp: float = 0.5
    pretrain_loss: str = "all"                   # all | mpc | mpc+global | mpc+local | global+local
    mul_pos_formulation: str = "soft"            # soft (Pretrain) | avg (PretrainNewMulPos)
    # The reference computes local token alignment over pad positions too
    # (model_pretrain_finetune_v0425_ablation.py:344-364 uses no mask). We default
    # to masking pads (sounder); set False for behavioral parity with the reference.
    mask_local_pad: bool = True


@dataclass
class DataConfig:
    data_name: str = "mimic_cxr"                 # mimic_cxr | iu_xray | multiview_cxr | two_view_cxr | mimic_abn
    ann_path: str = ""
    image_dir: str = ""
    tokenizer_dir: str = "config/tokenizer"
    tokenizer_model: str = "wordlevel"           # wordlevel | wordpiece
    tokenizer_type: str = "uncased"
    max_seq_len: int = 100
    align_type: str = "keywords"                 # keywords | report
    align_loss: str = "multi-level"              # local | global | multi-level
    batch_size: int = 32
    max_views: int = 4                           # static cap on views per study (pad/truncate)
    num_workers: int = 8
    prefetch: int = 2
    images_uint8: bool = True                    # ship uint8, normalize on device (4x less transfer)
    # cross-corpus retrieval (SURVEY §2.8: IU X-ray retrieves against MIMIC train)
    retrieve_db_ann_path: str = ""               # "" = same-corpus retrieval
    retrieve_db_image_dir: str = ""
    retrieve_topk: int = 20
    # N > 0: write N retrieved-neighbor grid PNGs per split for visual
    # inspection (reference PretrainTestAnalysis.show_topk_images,
    # modules/utils.py:611-721)
    retrieve_plot: int = 0


@dataclass
class OptimConfig:
    optim: str = "RAdam"                         # AdamW | RAdam
    lr_scheduler: str = "ReduceLROnPlateau"      # StepLR | ReduceLROnPlateau | WarmupCosine
    pt_lr: float = 5.0e-6                        # LR for pretrained-backbone params in finetune
    ft_lr: float = 5.0e-5                        # LR for new modules in finetune
    lr: float = 5.0e-5                           # single-group LR (pretrain stage)
    weight_decay: float = 1.0e-4
    amsgrad: bool = True
    step_size: int = 10
    gamma: float = 0.5
    grad_clip_value: float = 0.1                 # clip-by-value (reference: clip_grad_value_(0.1))
    # >1: average gradients over k micro-batches on device (optax.MultiSteps)
    # and apply the two-group update every k-th step — k x the effective
    # batch at the same memory, costing one grads-sized accumulator
    grad_accum_steps: int = 1


@dataclass
class TrainerConfig:
    task: str = "finetune"                       # pretrain | finetune | test | retrieve
    epochs: int = 50
    seed: int = 9233
    result_dir: str = "results"
    version: str = "v1"
    save_period: int = 1
    early_stop: int = 10
    async_checkpoint: bool = True                # orbax AsyncCheckpointer (overlap save/train)
    resume: str = ""
    load: str = ""
    n_devices: int = 0                           # 0 = use all visible devices
    # monitor config (reference: finetune_config.yaml:85-100)
    pt_monitor_mode: str = "min"
    pt_monitor_metric: str = "all_loss"
    pt_lr_monitor_metric: str = "all_loss"
    ft_monitor_mode: str = "max"
    ft_monitor_metric: str = "RCB"
    ft_lr_monitor_metric: str = "F1-Radgraph-partial"
    test_every: int = 5                          # pretrain: run test loop every N epochs
    log_interval: int = 100
    profile_epoch: int = 0                       # >0: jax.profiler trace of that epoch
    profile_dir: str = ""                        # trace output (default result_dir/profile)
    # >0: after test/serve, render per-generated-token cross-attention overlay
    # PNGs for this many studies into {result_dir}/attentions (the reference
    # Tester.plot surface, modules/tester.py:94)
    plot_heatmaps: int = 0


@dataclass
class MetricsConfig:
    chexbert_checkpoint: str = ""
    chexbert_model_checkpoint: str = ""
    chexbert_tokenizer_checkpoint: str = ""
    radgraph_checkpoint: str = ""
    bertscore_checkpoint: str = ""
    green_checkpoint: str = ""
    nli_checkpoint: str = ""                     # BERT-NLI for RadEntityNLI
    radgraph_reward_level: str = "partial"


@dataclass
class EvokeConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    # filled at runtime
    vocab_size: int = 0

    # ---- derived (reference: utils.py:126-142) ----
    @property
    def result_dir(self) -> str:
        return os.path.join(
            self.trainer.result_dir, self.data.data_name, self.trainer.task, self.trainer.version
        )

    @property
    def monitor_mode(self) -> str:
        if self.trainer.task in ("pretrain", "pretrain_inference"):
            return self.trainer.pt_monitor_mode
        return self.trainer.ft_monitor_mode

    @property
    def monitor_metric(self) -> str:
        if self.trainer.task in ("pretrain", "pretrain_inference"):
            return self.trainer.pt_monitor_metric
        return self.trainer.ft_monitor_metric

    @property
    def lr_monitor_metric(self) -> str:
        if self.trainer.task in ("pretrain", "pretrain_inference"):
            return self.trainer.pt_lr_monitor_metric
        return self.trainer.ft_lr_monitor_metric

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


_SECTIONS = {
    f.name for f in fields(EvokeConfig) if dataclasses.is_dataclass(getattr(EvokeConfig(), f.name))
}


def _apply_overrides(cfg: EvokeConfig, flat: Dict[str, Any]) -> List[str]:
    """Apply ``section.key`` or bare ``key`` overrides; returns unknown keys."""
    unknown = []
    for key, value in flat.items():
        if value is None:
            continue
        if "." in key:
            sec_name, attr = key.split(".", 1)
            sec = getattr(cfg, sec_name, None)
            if sec is not None and hasattr(sec, attr):
                setattr(sec, attr, _coerce(type(getattr(sec, attr)), value))
                continue
            unknown.append(key)
            continue
        # bare key: search every section (first match wins, sections ordered as declared)
        placed = False
        if hasattr(cfg, key) and not dataclasses.is_dataclass(getattr(cfg, key)):
            setattr(cfg, key, _coerce(type(getattr(cfg, key)), value))
            placed = True
        else:
            for f in fields(cfg):
                sec = getattr(cfg, f.name)
                if dataclasses.is_dataclass(sec) and hasattr(sec, key):
                    setattr(sec, key, _coerce(type(getattr(sec, key)), value))
                    placed = True
                    break
        if not placed:
            unknown.append(key)
    return unknown


def _coerce(typ, value):
    if typ is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "y", "t")
    if typ in (int, float, str) and not isinstance(value, typ):
        return typ(value)
    return value


def load_config(
    yaml_path: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
    argv: Optional[List[str]] = None,
) -> EvokeConfig:
    """Build an EvokeConfig: defaults <- YAML <- overrides <- CLI argv.

    YAML may be flat (reference-style keys) or nested by section. CLI args are
    ``--section.key value`` or ``--key value``.
    """
    cfg = EvokeConfig()
    if yaml_path:
        with open(yaml_path) as f:
            raw = yaml.safe_load(f) or {}
        flat: Dict[str, Any] = {}
        for k, v in raw.items():
            if isinstance(v, dict) and k in _SECTIONS:
                for kk, vv in v.items():
                    flat[f"{k}.{kk}"] = vv
            else:
                flat[k] = v
        _apply_overrides(cfg, flat)
    if overrides:
        _apply_overrides(cfg, dict(overrides))
    if argv:
        flat = {}
        i = 0
        while i < len(argv):
            tok = argv[i]
            if tok.startswith("--"):
                key = tok[2:]
                if "=" in key:
                    key, val = key.split("=", 1)
                    flat[key] = val
                    i += 1
                elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                    flat[key] = argv[i + 1]
                    i += 2
                else:
                    flat[key] = "true"
                    i += 1
            else:
                i += 1
        unknown = _apply_overrides(cfg, flat)
        if unknown:
            raise ValueError(f"Unknown config keys: {unknown}")
    return cfg
