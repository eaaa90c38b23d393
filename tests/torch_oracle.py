"""Independent PyTorch oracle for reference LightGCN semantics.

This is NOT a copy of the reference (which delegates to PyG ``LGConv`` /
``torch_scatter`` native kernels, unavailable here); it is a from-scratch
plain-torch implementation of the documented math the reference computes:

- weighted symmetric normalization with no self-loops, degrees aggregated at
  the destination column (PyG ``gcn_norm`` semantics as configured by
  reference ``src/lightgcn.py:82,96``);
- per-layer weighted-sum aggregation (``torch_scatter`` scatter-add);
- alpha-weighted layer combination (reference ``src/lightgcn.py:91-99``).

Tests compare the JAX framework against this oracle with allclose (SURVEY.md
§4 / BASELINE config 1).
"""
import torch


def gcn_norm(src: torch.Tensor, dst: torch.Tensor, weight: torch.Tensor, num_nodes: int):
    deg = torch.zeros(num_nodes, dtype=torch.float64)
    deg.index_add_(0, dst, weight.double())
    d_inv_sqrt = deg.pow(-0.5)
    d_inv_sqrt[torch.isinf(d_inv_sqrt)] = 0.0
    return (d_inv_sqrt[src] * weight.double() * d_inv_sqrt[dst]).float()


def lgconv(x: torch.Tensor, src, dst, weight, num_nodes: int) -> torch.Tensor:
    norm = gcn_norm(src, dst, weight, num_nodes)
    out = torch.zeros_like(x)
    out.index_add_(0, dst, x[src] * norm[:, None])
    return out


def lightgcn_embedding(
    embedding: torch.Tensor, src, dst, weight, num_layers: int
) -> torch.Tensor:
    """Reference ``get_embedding`` (``src/lightgcn.py:91-99``) with uniform alpha."""
    n = embedding.shape[0]
    alpha = 1.0 / (num_layers + 1)
    x = embedding
    out = x * alpha
    for _ in range(num_layers):
        x = lgconv(x, src, dst, weight, n)
        out = out + x * alpha
    return out


def bidirectional(u: torch.Tensor, i: torch.Tensor, w: torch.Tensor):
    """Reference ``df_to_graph`` arc construction (``src/utils_v2.py:153-163``)."""
    src = torch.cat([u, i])
    dst = torch.cat([i, u])
    return src, dst, torch.cat([w, w])
