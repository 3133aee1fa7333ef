"""Optimizer construction: AdamW + layer-wise LR decay + schedulers (optax).

Parity targets:
- ``LayerDecayOptimWrapperConstructor`` (reference
  ``engine/optim_wrappers/layer_decay_optim_wrapper.py:20``): per-parameter
  LR scale ``decay_rate ** (num_layers + 2 - layer_id - 1)`` where layer_id
  is 0 for patch-embed / pos-embed / cls-token, ``i + 1`` for transformer
  block i, and ``num_layers + 1`` for everything else (head); weight decay 0
  for 1-D params / biases / pos_embed.
- Param schedulers (``engine/schedulers`` + mmengine): LinearLR warmup,
  MultiStepLR, CosineAnnealing, ConstantLR, QuadraticWarmup — composed into
  one optax schedule over *iterations*.
- ``clip_grad=dict(max_norm=...)`` -> optax.clip_by_global_norm.

Everything returns a single ``optax.GradientTransformation`` so the train
step stays one fused device program.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
import optax

from probpose_code_tpu.registry import PARAM_SCHEDULERS


def vit_layer_id(path: Tuple[str, ...], num_layers: int) -> int:
    """Layer index of a flattened param path for layer-wise LR decay."""
    name = "/".join(str(p) for p in path)
    if "pos_embed" in name or "cls_token" in name or "mask_token" in name:
        return 0
    if "patch_embed" in name:
        return 0
    m = re.search(r"block(\d+)", name)
    if m and "backbone" in name:
        return int(m.group(1)) + 1
    return num_layers + 1  # head & everything else: full LR


def _path_names(params) -> Dict[Tuple, str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, _ in flat:
        out[tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)] = None
    return out


def make_lr_scale_tree(params, num_layers: int, decay_rate: float):
    """Per-leaf LR multiplier pytree."""

    def scale_fn(path, leaf):
        names = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        layer_id = vit_layer_id(names, num_layers)
        # reference: scale = rate ** (num_layers + 2 - layer_id - 1)
        return decay_rate ** (num_layers + 2 - layer_id - 1)

    return jax.tree_util.tree_map_with_path(scale_fn, params)


def make_wd_mask_tree(params):
    """True where weight decay applies (>=2-D, not pos_embed/bias)."""

    def mask_fn(path, leaf):
        names = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if leaf.ndim <= 1 or names.endswith("bias") or "pos_embed" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def scale_by_lr_tree(scales):
    """Optax transform multiplying updates by a static per-leaf scale tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# --------------------------------------------------------------------------
# Schedulers — composed piecewise schedule over iterations
# --------------------------------------------------------------------------


def build_schedule(
    scheduler_cfgs: Sequence[Dict[str, Any]],
    base_lr: float,
    steps_per_epoch: int,
    max_epochs: int,
) -> Callable[[int], float]:
    """Compose mmengine-style param_scheduler configs into lr(step).

    Supported types: LinearLR, MultiStepLR, ConstantLR, CosineAnnealingLR,
    QuadraticWarmupLR, ExponentialLR. ``by_epoch=True`` ranges are in epochs
    (converted to iterations); warmups with ``by_epoch=False`` are in
    iterations. Factors multiply, matching mmengine's scheduler stacking.
    """
    total_steps = steps_per_epoch * max_epochs

    def lr_fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        lr = jnp.asarray(base_lr, dtype=jnp.float32)
        for cfg in scheduler_cfgs:
            cfg = dict(cfg)
            t = cfg.pop("type")
            by_epoch = cfg.get("by_epoch", True)
            unit = steps_per_epoch if by_epoch else 1
            begin = cfg.get("begin", 0) * unit
            end = cfg.get("end", max_epochs if by_epoch else total_steps) * unit

            if t == "LinearLR":
                start = cfg.get("start_factor", 1.0 / 3)
                stop = cfg.get("end_factor", 1.0)
                frac = jnp.clip((step - begin) / max(end - begin, 1), 0.0, 1.0)
                factor = start + (stop - start) * frac
                lr = lr * jnp.where(step < begin, start, factor)
            elif t == "QuadraticWarmupLR":
                frac = jnp.clip((step - begin) / max(end - begin, 1), 0.0, 1.0)
                lr = lr * jnp.where(step < end, frac**2, 1.0)
            elif t == "MultiStepLR":
                gamma = cfg.get("gamma", 0.1)
                milestones = jnp.asarray([m * unit for m in cfg.get("milestones", [])])
                n_passed = (step[None] >= milestones).sum() if milestones.size else 0
                active = (step >= begin) & (step < end)
                lr = lr * jnp.where(active | (step >= end), gamma**n_passed, 1.0)
            elif t == "ConstantLR":
                factor = cfg.get("factor", 1.0 / 3)
                lr = lr * jnp.where((step >= begin) & (step < end), factor, 1.0)
            elif t == "CosineAnnealingLR":
                eta_min = cfg.get("eta_min", 0.0)
                T = max(end - begin, 1)
                frac = jnp.clip((step - begin) / T, 0.0, 1.0)
                cos_factor = eta_min / base_lr + (1 - eta_min / base_lr) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
                lr = lr * jnp.where(step >= begin, cos_factor, 1.0)
            elif t == "ExponentialLR":
                gamma = cfg.get("gamma", 0.9)
                epochs_passed = jnp.floor((step - begin) / max(unit, 1))
                lr = lr * jnp.where(step >= begin, gamma**epochs_passed, 1.0)
            else:
                raise ValueError(f"Unsupported scheduler type {t}")
        return lr

    return lr_fn


# register scheduler names so configs referencing them validate
for _name in ("LinearLR", "MultiStepLR", "ConstantLR", "CosineAnnealingLR", "QuadraticWarmupLR", "ExponentialLR"):
    PARAM_SCHEDULERS.register_module(name=_name, module=lambda **kw: kw, force=True)


# --------------------------------------------------------------------------
# Optimizer assembly
# --------------------------------------------------------------------------


def build_optimizer(
    params,
    optim_wrapper: Dict[str, Any],
    param_scheduler: Optional[List[Dict[str, Any]]] = None,
    steps_per_epoch: int = 1000,
    max_epochs: int = 210,
) -> Tuple[optax.GradientTransformation, Callable[[int], float]]:
    """Build the full optax chain from a reference-style optim_wrapper cfg.

    Returns (tx, lr_schedule_fn). lr_schedule_fn is exposed for logging.
    """
    opt_cfg = dict(optim_wrapper.get("optimizer", {}))
    opt_type = opt_cfg.pop("type", "AdamW")
    base_lr = opt_cfg.pop("lr", 1e-3)
    weight_decay = opt_cfg.pop("weight_decay", 0.0)
    betas = opt_cfg.pop("betas", (0.9, 0.999))
    momentum = opt_cfg.pop("momentum", 0.9)

    if param_scheduler:
        lr_fn = build_schedule(param_scheduler, base_lr, steps_per_epoch, max_epochs)
    else:
        lr_fn = lambda step: base_lr  # noqa: E731

    chain = []
    clip_cfg = optim_wrapper.get("clip_grad")
    if clip_cfg and clip_cfg.get("max_norm"):
        chain.append(optax.clip_by_global_norm(clip_cfg["max_norm"]))

    if opt_type == "AdamW":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
        wd_mask = make_wd_mask_tree(params)
        chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    elif opt_type == "Adam":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    elif opt_type == "SGD":
        chain.append(optax.trace(decay=momentum, nesterov=opt_cfg.get("nesterov", False)))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(f"Unsupported optimizer type {opt_type}")

    # layer-wise lr decay (LayerDecayOptimWrapperConstructor)
    paramwise = optim_wrapper.get("paramwise_cfg") or {}
    constructor = optim_wrapper.get("constructor")
    if constructor == "LayerDecayOptimWrapperConstructor" or "layer_decay_rate" in paramwise:
        num_layers = paramwise.get("num_layers", 12)
        decay_rate = paramwise.get("layer_decay_rate", 0.75)
        scales = make_lr_scale_tree(params, num_layers, decay_rate)
        chain.append(scale_by_lr_tree(scales))

    chain.append(optax.scale_by_learning_rate(lr_fn))
    tx = optax.chain(*chain)

    # gradient accumulation (mmengine OptimWrapper ``accumulative_counts``):
    # apply the chained update every k steps on the mean of k gradients
    accum = int(optim_wrapper.get("accumulative_counts", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    # AMP surface (mmengine AmpOptimWrapper): accepted for config parity.
    # On TPU mixed precision is bfloat16 (set model-side via --amp or the
    # backbone/head ``dtype`` config); bf16 keeps the f32 exponent range,
    # so the reference's f16 loss scaling ('dynamic'/float) is a no-op here
    # — parameters, optimizer state and the loss stay f32 either way.
    if optim_wrapper.get("type") == "AmpOptimWrapper":
        loss_scale = optim_wrapper.get("loss_scale", "dynamic")
        if isinstance(loss_scale, (int, float)) and float(loss_scale) != 1.0:
            import warnings

            warnings.warn(
                "AmpOptimWrapper.loss_scale is ignored on TPU: bfloat16 "
                "compute needs no loss scaling (f32 exponent range)"
            )
    return tx, lr_fn
