"""Optimizer factory (reference ``bert4rec/trainers/optimizers/__init__.py:7-76``
and ``adam_w_optimizer.py:6-168``), rebuilt as an optax chain:

    clip_by_global_norm(5.0)
    -> adamw(warmup+polynomial-decay schedule,
             weight_decay masked to exclude LayerNorm/layer_norm/bias)

Defaults follow the reference (which follows FeiSun/BERT4Rec): init_lr=1e-4,
400k steps, 100 warmup steps, weight decay 0.01, betas (0.9, 0.999),
eps 1e-6, global-norm clip 5.0 (reference optimizers/__init__.py:7-36,
adam_w_optimizer.py:67).
"""

import re
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import optax

DEFAULT_EXCLUDE_FROM_WEIGHT_DECAY = ("LayerNorm", "layer_norm", "bias",
                                     "norm", "scale_bias")


def create_warmup_poly_schedule(init_lr: float,
                                num_train_steps: int,
                                num_warmup_steps: int,
                                power: float = 1.0,
                                end_lr: float = 0.0):
    """Linear warmup to ``init_lr`` then polynomial decay to ``end_lr``.

    Matches the reference ``WarmUp`` wrapper semantics
    (adam_w_optimizer.py:6-45): during warmup lr = init_lr * step/warmup;
    afterwards the decay schedule is evaluated at the *global* step.
    """
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup_lr = init_lr * step / jnp.maximum(1.0, float(num_warmup_steps))
        frac = jnp.clip(step / float(num_train_steps), 0.0, 1.0)
        decay_lr = (init_lr - end_lr) * (1.0 - frac) ** power + end_lr
        return jnp.where(step < num_warmup_steps, warmup_lr, decay_lr)
    return schedule


def _weight_decay_mask(exclude_patterns: Sequence[str]):
    """Pytree-of-bools mask fn: decay only params whose path matches no
    excluded pattern (reference regex include/exclude,
    adam_w_optimizer.py:154-168). Our LN params are named scale/bias under
    ``*_norm`` dicts, and dense biases are named ``bias``."""
    regexes = [re.compile(p) for p in exclude_patterns]

    def path_str(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    def mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not any(r.search(path_str(p)) for r in regexes),
            params)
    return mask


def create_adam_w_optimizer(
        init_lr: float = 1e-4,
        num_train_steps: int = 400000,
        num_warmup_steps: int = 100,
        weight_decay_rate: float = 0.01,
        beta_1: float = 0.9,
        beta_2: float = 0.999,
        epsilon: float = 1e-6,
        exclude_from_weight_decay: Sequence[str] =
        DEFAULT_EXCLUDE_FROM_WEIGHT_DECAY,
        global_clipnorm: float = 5.0,
        power: float = 1.0) -> optax.GradientTransformation:
    schedule = create_warmup_poly_schedule(
        init_lr, num_train_steps, num_warmup_steps, power)
    return optax.chain(
        optax.clip_by_global_norm(global_clipnorm),
        optax.adamw(
            learning_rate=schedule,
            b1=beta_1, b2=beta_2, eps=epsilon,
            weight_decay=weight_decay_rate,
            mask=_weight_decay_mask(exclude_from_weight_decay)),
    )


optimizers_map = {
    "adamw": create_adam_w_optimizer,
    "adam_w": create_adam_w_optimizer,
}


def get(identifier: Union[str, optax.GradientTransformation] = "adamw",
        **kwargs) -> optax.GradientTransformation:
    """Factory (reference optimizers/__init__.py:59-76)."""
    if isinstance(identifier, optax.GradientTransformation):
        return identifier
    if identifier in optimizers_map:
        return optimizers_map[identifier](**kwargs)
    raise ValueError(f"{identifier} is not a known optimizer identifier!")


__all__ = ["create_adam_w_optimizer", "create_warmup_poly_schedule",
           "optimizers_map", "get",
           "DEFAULT_EXCLUDE_FROM_WEIGHT_DECAY"]
