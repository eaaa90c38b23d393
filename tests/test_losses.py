"""Loss parity vs torch formulations of the reference math."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gnn_ecommerce_tpu.models import bpr_loss, bpr_loss_reference, reg_loss, link_pred_loss


def test_bpr_loss_net_math(rng):
    pos = rng.standard_normal(256).astype(np.float32)
    neg = rng.standard_normal(256).astype(np.float32)
    ours = float(bpr_loss(jnp.asarray(pos), jnp.asarray(neg)))
    # Reference driver net math (src/train_lightgcn.py:141):
    # recommendation_loss(pos, neg, 0) * B == -mean(logsigmoid(pos - neg)).
    expected = float(-F.logsigmoid(torch.tensor(pos) - torch.tensor(neg)).mean())
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_bpr_loss_reference_form(rng):
    pos = rng.standard_normal(128).astype(np.float32)
    neg = rng.standard_normal(128).astype(np.float32)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    lam = 1e-4
    ours = float(bpr_loss_reference(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(emb), lam))
    # Literal BPRLoss.forward (src/lightgcn.py:279-286).
    log_prob = F.logsigmoid(torch.tensor(pos) - torch.tensor(neg)).mean()
    reg = lam * torch.tensor(emb).norm(p=2).pow(2)
    expected = float((-log_prob + reg) / 128)
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_reg_loss(rng):
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    u = rng.integers(0, 50, 32)
    p = rng.integers(50, 100, 32)
    n = rng.integers(50, 100, 32)
    decay = 1e-4
    ours = float(reg_loss(jnp.asarray(emb), jnp.asarray(u), jnp.asarray(p), jnp.asarray(n), decay))
    # Reference regularization_loss (src/utils_v2.py:205-211).
    e = torch.tensor(emb)
    expected = float(
        (0.5 * (e[u].norm().pow(2) + e[p].norm().pow(2) + e[n].norm().pow(2)) / 32) * decay
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_link_pred_loss(rng):
    logits = rng.standard_normal(64).astype(np.float32) * 3
    labels = rng.integers(0, 2, 64).astype(np.float32)
    ours = float(link_pred_loss(jnp.asarray(logits), jnp.asarray(labels)))
    expected = float(F.binary_cross_entropy_with_logits(torch.tensor(logits), torch.tensor(labels)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)
