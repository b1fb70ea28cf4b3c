"""Optimizers + LR schedulers.

Capability parity: EVOKE modules/optimizers.py — Adam(amsgrad)/RAdam with
L2-into-grad weight decay (torch semantics, NOT decoupled AdamW), a two-group
split for finetune (new modules at ft_lr: text_decoder / visual_self_atten /
multimodal_fusion / visual_head / text_head; pretrained backbone at pt_lr), and
grad clip-by-value 0.1 applied before the step (trainer_v0401.py:262,434,455).

Schedulers: StepLR(step_size, gamma) and ReduceLROnPlateau on the monitor
metric. Implemented host-side as an ``lr_scale`` hyperparameter injected into
the optax chain (optax.inject_hyperparams) so the jitted step never recompiles
on LR change.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import optax

FT_GROUP_SUBSTRINGS = ("text_decoder", "visual_self_atten", "multimodal_fusion",
                       "visual_head", "text_head")


def _param_labels(params) -> Any:
    """Label each param 'ft' if its path matches a new-module name, else 'pt'."""

    def label(path, _):
        names = "/".join(str(getattr(k, "key", k)) for k in path)
        return "ft" if any(s in names for s in FT_GROUP_SUBSTRINGS) else "pt"

    return jax.tree_util.tree_map_with_path(label, params)


def _scaler(optim_name: str):
    if optim_name == "RAdam":
        return optax.scale_by_radam()
    # the reference's 'AdamW' choice is actually torch Adam(amsgrad=True)
    return optax.scale_by_amsgrad()


def build_optimizer(optim_name: str, task: str, params, pt_lr: float, ft_lr: float,
                    weight_decay: float, grad_clip_value: float = 0.1,
                    grad_accum_steps: int = 1):
    """Returns an optax GradientTransformation with injectable lr_scale.

    grad_accum_steps > 1 wraps the whole chain in optax.MultiSteps: the train
    step is called per micro-batch, gradients are averaged on device, and the
    update (incl. clip — applied to the AVERAGED gradient, matching a
    single large-batch step, not per-micro-batch) fires every k-th call with
    zero updates in between. Costs one grads-sized f32 accumulator buffer.
    """

    @optax.inject_hyperparams
    def make(lr_scale):
        def group(lr):
            return optax.chain(
                optax.clip(grad_clip_value),                 # clip-by-value on raw grads
                optax.add_decayed_weights(weight_decay),     # L2-into-grad (torch semantics)
                _scaler(optim_name),
                optax.scale(-1.0),
                optax.scale_by_learning_rate(lr * lr_scale, flip_sign=False),
            )

        if task == "finetune":
            labels = _param_labels(params)
            return optax.multi_transform({"pt": group(pt_lr), "ft": group(ft_lr)}, labels)
        return group(pt_lr)

    tx = make(lr_scale=1.0)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps
                              ).gradient_transformation()
    return tx


def set_lr_scale(opt_state, scale: float):
    """Update the injected lr_scale in an inject_hyperparams state (reaching
    through a MultiSteps wrapper when grad accumulation is on)."""
    inner = getattr(opt_state, "inner_opt_state", opt_state)
    inner.hyperparams["lr_scale"] = jax.numpy.asarray(scale, dtype=jax.numpy.float32)
    return opt_state


@dataclass
class StepScheduler:
    """StepLR: scale = gamma ** (epoch // step_size)."""

    step_size: int = 10
    gamma: float = 0.5

    def scale_for_epoch(self, epoch: int, metric: float | None = None) -> float:
        return self.gamma ** (epoch // self.step_size)

    def update(self, epoch: int, metric: float | None = None) -> float:
        return self.scale_for_epoch(epoch)


@dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (torch defaults: factor 0.1, patience 10, rel threshold 1e-4)."""

    mode: str = "min"
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    min_scale: float = 1e-8
    _scale: float = field(default=1.0, init=False)
    _best: float | None = field(default=None, init=False)
    _bad_epochs: int = field(default=0, init=False)

    def _is_better(self, metric: float) -> bool:
        if self._best is None:
            return True
        if self.mode == "min":
            return metric < self._best * (1.0 - self.threshold)
        return metric > self._best * (1.0 + self.threshold)

    def update(self, epoch: int, metric: float | None = None) -> float:
        if metric is None:
            return self._scale
        if self._is_better(metric):
            self._best = metric
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience:
                self._scale = max(self._scale * self.factor, self.min_scale)
                self._bad_epochs = 0
        return self._scale

    def state_dict(self) -> Dict[str, Any]:
        return {"scale": self._scale, "best": self._best, "bad_epochs": self._bad_epochs}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self._scale = d["scale"]
        self._best = d["best"]
        self._bad_epochs = d["bad_epochs"]


@dataclass
class WarmupCosineScheduler:
    """LinearWarmupCosineAnnealing (reference models/schedulers/*.py parity):
    linear 0 -> 1 over warmup_epochs, then cosine to min_scale at max_epochs."""

    warmup_epochs: int = 5
    max_epochs: int = 50
    min_scale: float = 0.0

    def update(self, epoch: int, metric: float | None = None) -> float:
        import math

        if epoch < self.warmup_epochs:
            return max(epoch / max(self.warmup_epochs, 1), 1e-8)
        t = min((epoch - self.warmup_epochs) /
                max(self.max_epochs - self.warmup_epochs, 1), 1.0)
        return self.min_scale + (1 - self.min_scale) * 0.5 * (1 + math.cos(math.pi * t))


def build_scheduler(name: str, mode: str, step_size: int = 10, gamma: float = 0.5,
                    warmup_epochs: int = 5, max_epochs: int = 50):
    if name == "StepLR":
        return StepScheduler(step_size=step_size, gamma=gamma)
    if name == "WarmupCosine":
        return WarmupCosineScheduler(warmup_epochs=warmup_epochs, max_epochs=max_epochs)
    return PlateauScheduler(mode=mode)
