"""Weight-porting parity: a randomly initialized timm-layout torch ViT and
our flax ViTBackbone with ported weights must produce identical tokens."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pixelspointspolygons_tpu.models.vit import ViTBackbone  # noqa: E402
from pixelspointspolygons_tpu.utils.torch_port import port_timm_vit  # noqa: E402

DIM, HEADS, DEPTH, PATCH, IMG = 32, 4, 2, 8, 32


def make_torch_vit_state(seed=0):
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    sd = {
        "cls_token": r(1, 1, DIM),
        "pos_embed": r(1, (IMG // PATCH) ** 2 + 1, DIM),
        "patch_embed.proj.weight": r(DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(DIM),
        "norm.weight": 1 + 0.1 * r(DIM),
        "norm.bias": r(DIM),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd.update(
            {
                p + "norm1.weight": 1 + 0.1 * r(DIM),
                p + "norm1.bias": r(DIM),
                p + "attn.qkv.weight": r(3 * DIM, DIM),
                p + "attn.qkv.bias": r(3 * DIM),
                p + "attn.proj.weight": r(DIM, DIM),
                p + "attn.proj.bias": r(DIM),
                p + "norm2.weight": 1 + 0.1 * r(DIM),
                p + "norm2.bias": r(DIM),
                p + "mlp.fc1.weight": r(4 * DIM, DIM),
                p + "mlp.fc1.bias": r(4 * DIM),
                p + "mlp.fc2.weight": r(DIM, DIM * 4),
                p + "mlp.fc2.bias": r(DIM),
            }
        )
    return sd


def torch_vit_forward(sd, x):
    """Reference timm-semantics forward (pre-norm blocks, exact GELU)."""
    B = x.shape[0]
    x = torch.nn.functional.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=PATCH
    )  # (B, D, g, g)
    x = x.flatten(2).transpose(1, 2)  # (B, N, D)
    cls = sd["cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + sd["pos_embed"]
    ln = torch.nn.functional.layer_norm
    for i in range(DEPTH):
        p = f"blocks.{i}."
        h = ln(x, (DIM,), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = h @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        hd = DIM // HEADS
        reshape = lambda t: t.reshape(B, -1, HEADS, hd).transpose(1, 2)
        q, k, v = map(reshape, (q, k, v))
        att = torch.softmax(q @ k.transpose(-1, -2) / hd**0.5, dim=-1)
        out = (att @ v).transpose(1, 2).reshape(B, -1, DIM)
        out = out @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
        x = x + out
        h = ln(x, (DIM,), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        h = h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
        h = torch.nn.functional.gelu(h)
        h = h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        x = x + h
    return ln(x, (DIM,), sd["norm.weight"], sd["norm.bias"])


def test_ported_vit_matches_torch(rng):
    sd = make_torch_vit_state()
    params = port_timm_vit(sd, depth=DEPTH)

    model = ViTBackbone(img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH, num_heads=HEADS)
    x_np = rng.rand(2, IMG, IMG, 3).astype(np.float32)
    # shape-check the ported tree against a fresh init
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
    for path, leaf in jax.tree_util.tree_leaves_with_path(init):
        ported = params
        for k in path:
            ported = ported[k.key]
        assert np.shape(ported) == leaf.shape, path

    got = model.apply({"params": params}, jnp.asarray(x_np))
    want = torch_vit_forward(sd, torch.tensor(x_np).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)  # f32 accumulation-order noise; wrong wiring would be O(1)
