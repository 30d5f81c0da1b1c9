"""Adversary MLP: predicts the protected attribute from image–text similarity
scores (reference: debias_clip/model/model.py:337-361; protocol README.md:152-155).

Architecture parity: n_input → hidden → hidden → hidden → n_output, ReLU
between layers, sigmoid on the output; torch-default uniform init.  The
functional core returns logits too (``apply_logits``) because the training
loss uses sigmoid-cross-entropy-with-logits for numerical stability — the
sigmoid-activated ``apply`` matches the reference forward exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

from ..core.config import AdversaryConfig, Dotdict, adversary_config_from_dotdict
from .layers import Params, init_mlp


def init_adversary_params(rng, cfg: AdversaryConfig) -> Params:
    sizes = [cfg.n_input, cfg.hidden_size, cfg.hidden_size, cfg.hidden_size,
             cfg.n_output]
    return init_mlp(rng, sizes)


def apply_logits(params: Params, x: jax.Array) -> jax.Array:
    """MLP forward without the output sigmoid. x: [..., n_input]."""
    h = x
    layers = params["layers"]
    for i, layer in enumerate(layers):
        h = jnp.dot(h, layer["kernel"].astype(h.dtype)) + layer["bias"].astype(h.dtype)
        if i < len(layers) - 1:
            h = jax.nn.relu(h)
    return h


def apply(params: Params, x: jax.Array) -> jax.Array:
    """Reference forward: sigmoid(MLP(x)) (model/model.py:360-361)."""
    return jax.nn.sigmoid(apply_logits(params, x))


@dataclasses.dataclass
class Adversary:
    params: Params
    cfg: AdversaryConfig

    def __call__(self, x) -> jax.Array:
        return apply(self.params, jnp.asarray(x))

    forward = __call__

    def logits(self, x) -> jax.Array:
        return apply_logits(self.params, jnp.asarray(x))

    @staticmethod
    def from_cfg(cfg: Union[dict, Dotdict], rng=None) -> "Adversary":
        """Reference constructor surface: ADV_N_INPUT / ADV_N_OUTPUT /
        ADV_HIDDEN_SIZE (+ ignored ADV_DEVICE) — model/model.py:339-346."""
        acfg = adversary_config_from_dotdict(cfg)
        if rng is None:
            rng = jax.random.key(Dotdict(cfg).SEED or 0)
        return Adversary(params=init_adversary_params(rng, acfg), cfg=acfg)


# pytree registration: params traced, config static (see models/debias.py)
jax.tree_util.register_pytree_node(
    Adversary,
    lambda m: ((m.params,), (m.cfg,)),
    lambda aux, ch: Adversary(params=ch[0], cfg=aux[0]),
)
