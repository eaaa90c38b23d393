"""gnn_ecommerce_tpu — a TPU-native LightGCN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
system happykygo/GNN-eCommerce (PyTorch/PyG, single GPU): LightGCN trained with
BPR loss on a weighted bipartite user-item graph, with Recall/Precision@K
evaluation, top-K recommendation, explainability, and online serving — built
TPU-first (static shapes, precomputed symmetric normalization consumed by an
SpMM, jit-compatible sampling, device meshes via ``jax.sharding``).

Subpackages
-----------
graph     BipartiteGraph pytree: COO/CSR adjacency with precomputed
          symmetric normalization (reference: PyG ``gcn_norm`` semantics used
          by ``src/lightgcn.py:96``).
ops       Propagation (SpMM) paths: XLA segment-sum oracle and Pallas kernels;
          blocked top-K scoring.
models    LightGCN params + pure functions (reference: ``src/lightgcn.py``),
          BPR/regularization losses, SVD baseline.
data      Event→edge-weight pipeline, split/sync/relabel, positive/ignore
          lists (reference: ``src/utils_v2.py``, preprocessing notebook).
sampling  jit-compatible BPR (user, pos, neg) mini-batch sampler
          (reference: ``src/utils_v2.py:168-190``).
train     Optax train step, epoch driver, checkpoint/resume.
eval      MARK (Recall/Precision@K) metrics with purchased-item masking
          (reference: ``src/lightgcn.py:169-189``).
parallel  Mesh construction and sharded train/eval steps (no reference
          counterpart — the reference is single-device).
serve     Embedding-cache REST server (reference: ``torchserve/``).
explain   BFS shortest-path explainability + plots (reference:
          ``src/inference_lightgcn.py:85-119``, ``src/plot.py``).
cli       train / infer / serve / preprocess entry points.
"""

__version__ = "0.1.0"
