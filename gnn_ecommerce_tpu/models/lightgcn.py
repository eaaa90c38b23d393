"""LightGCN as pure functions over a params pytree.

Re-design of the reference model class (``src/lightgcn.py:13-231``, itself a
copy of PyG's LightGCN) into jit/pjit-compatible pure functions:

- params are a plain dict pytree ``{"embedding": [num_nodes, dim]}`` — the
  only learnable state LightGCN has (reference ``src/lightgcn.py:81``);
- layer propagation consumes the pre-normalized graph (one SpMM per layer)
  instead of re-running ``gcn_norm`` inside every conv call;
- the final embedding is the alpha-weighted sum over layer outputs with
  uniform ``alpha = 1/(L+1)`` by default (reference ``src/lightgcn.py:72-79``).

Top-K recommendation / MARK metrics live in ``gnn_ecommerce_tpu.eval`` (the
reference keeps them as model methods, ``src/lightgcn.py:138-189``); losses
live in ``models/losses.py``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..graph.build import BipartiteGraph
from ..ops.propagate import propagate_segment


@dataclasses.dataclass(frozen=True)
class LightGCNConfig:
    """Model hyperparameters (reference ``tune_config``,
    ``src/train_lightgcn.py:47-53``)."""

    num_nodes: int
    embedding_dim: int = 64
    num_layers: int = 3
    # None -> uniform 1/(num_layers+1); else a length num_layers+1 vector.
    alpha: Optional[Sequence[float]] = None

    def alphas(self) -> jnp.ndarray:
        if self.alpha is None:
            return jnp.full((self.num_layers + 1,), 1.0 / (self.num_layers + 1), jnp.float32)
        a = jnp.asarray(self.alpha, jnp.float32)
        assert a.shape == (self.num_layers + 1,)
        return a


def init_params(key: jax.Array, cfg: LightGCNConfig, dtype=jnp.float32) -> dict:
    """Xavier-uniform embedding init.

    Matches ``torch.nn.init.xavier_uniform_`` on the ``[num_nodes, dim]``
    embedding weight (reference ``src/lightgcn.py:87``): bound =
    sqrt(6 / (fan_in + fan_out)) with fan_in=dim, fan_out=num_nodes.
    """
    bound = (6.0 / (cfg.num_nodes + cfg.embedding_dim)) ** 0.5
    emb = jax.random.uniform(
        key, (cfg.num_nodes, cfg.embedding_dim), dtype, minval=-bound, maxval=bound
    )
    return {"embedding": emb}


def get_embedding(
    params: dict,
    graph: BipartiteGraph,
    cfg: LightGCNConfig,
    propagate_fn: Callable = propagate_segment,
) -> jax.Array:
    """Alpha-weighted sum of the L+1 layer embeddings.

    Reference ``src/lightgcn.py:91-99``: ``out = a0*E; for l: x = conv(x);
    out += a_{l+1}*x``. The Python loop is over a STATIC layer count, so it
    unrolls into L fused SpMMs under jit.
    """
    alpha = cfg.alphas().astype(params["embedding"].dtype)
    x = params["embedding"]
    out = x * alpha[0]
    for layer in range(cfg.num_layers):
        x = propagate_fn(graph, x)
        out = out + x * alpha[layer + 1]
    return out


def pair_scores(final_embedding: jax.Array, src_idx: jax.Array, dst_idx: jax.Array) -> jax.Array:
    """Dot-product rankings for (src, dst) node pairs.

    Reference ``forward`` tail (``src/lightgcn.py:123-125``):
    ``(out[src] * out[dst]).sum(-1)``.
    """
    return jnp.sum(final_embedding[src_idx] * final_embedding[dst_idx], axis=-1)


@partial(jax.jit, static_argnames=("cfg", "propagate_fn"))
def forward(
    params: dict,
    graph: BipartiteGraph,
    edge_label_index: jax.Array,
    cfg: LightGCNConfig,
    propagate_fn: Callable = propagate_segment,
) -> jax.Array:
    """Full forward: propagate then score labeled pairs.

    Reference ``src/lightgcn.py:101-125`` (with ``edge_label_index`` always
    provided — the reference's fallback to scoring all graph edges is covered
    by passing ``jnp.stack([graph.src, graph.dst])``).
    """
    out = get_embedding(params, graph, cfg, propagate_fn)
    return pair_scores(out, edge_label_index[0], edge_label_index[1])


def predict_link(
    params: dict,
    graph: BipartiteGraph,
    edge_label_index: jax.Array,
    cfg: LightGCNConfig,
    prob: bool = False,
) -> jax.Array:
    """Link probabilities / hard predictions (reference ``src/lightgcn.py:127-136``)."""
    p = jax.nn.sigmoid(forward(params, graph, edge_label_index, cfg))
    return p if prob else jnp.round(p)
