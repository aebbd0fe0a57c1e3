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


def test_ported_dinov2_matches_torch(rng):
    """DINOv2 layout = timm + LayerScale gammas (reference vit_dinov2.py:27)."""
    from pixelspointspolygons_tpu.utils.torch_port import port_dinov2_vit

    sd = make_torch_vit_state(seed=3)
    g = torch.Generator().manual_seed(7)
    for i in range(DEPTH):
        sd[f"blocks.{i}.ls1.gamma"] = torch.randn(DIM, generator=g) * 0.1
        sd[f"blocks.{i}.ls2.gamma"] = torch.randn(DIM, generator=g) * 0.1
    params = port_dinov2_vit(sd, depth=DEPTH)

    model = ViTBackbone(
        img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH, num_heads=HEADS,
        layer_scale=True,
    )
    x_np = rng.rand(2, IMG, IMG, 3).astype(np.float32)
    got = model.apply({"params": params}, jnp.asarray(x_np))

    # torch side: timm forward with LayerScale spliced in
    x = torch.tensor(x_np).permute(0, 3, 1, 2)
    B = x.shape[0]
    x = torch.nn.functional.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=PATCH
    ).flatten(2).transpose(1, 2)
    x = torch.cat([sd["cls_token"].expand(B, -1, -1), x], dim=1) + sd["pos_embed"]
    ln = torch.nn.functional.layer_norm
    for i in range(DEPTH):
        p = f"blocks.{i}."
        h = ln(x, (DIM,), sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = h @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        hd = DIM // HEADS
        rs = lambda t: t.reshape(B, -1, HEADS, hd).transpose(1, 2)
        att = torch.softmax(rs(q) @ rs(k).transpose(-1, -2) / hd**0.5, dim=-1)
        out = (att @ rs(v)).transpose(1, 2).reshape(B, -1, DIM)
        out = out @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
        x = x + out * sd[p + "ls1.gamma"]
        h = ln(x, (DIM,), sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        h = torch.nn.functional.gelu(h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"])
        h = h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        x = x + h * sd[p + "ls2.gamma"]
    want = ln(x, (DIM,), sd["norm.weight"], sd["norm.bias"]).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=2e-3)  # f32 accumulation noise; wrong wiring would be O(1)


# ---------------------------------------------------------------------------
# HRNetV2 port parity: a lazily-materialized random torch state_dict driven
# through a functional forward with the reference's exact semantics
# (hrnet48v2.py:482-529) vs our flax HRNetEncoder with ported weights.

TOPO = dict(width=4, stage1_planes=4, stage1_blocks=2, num_blocks=2,
            num_modules=(1, 1, 1), stem_ch=8)
HR_IMG, HR_OUT = 32, 12


class _TorchHR:
    """Functional HRNet forward; creates random params on first use so the
    state_dict layout is defined by *consumption*, exactly like torch keys."""

    def __init__(self, seed=0):
        self.sd = {}
        self.g = torch.Generator().manual_seed(seed)

    def conv(self, p, x, ch, k, s=1, bias=False):
        wk = p + ".weight"
        if wk not in self.sd:
            self.sd[wk] = torch.randn(ch, x.shape[1], k, k, generator=self.g) * (0.3 / k)
            if bias:
                self.sd[p + ".bias"] = torch.randn(ch, generator=self.g) * 0.05
        return torch.nn.functional.conv2d(
            x, self.sd[wk], self.sd.get(p + ".bias"), stride=s, padding=k // 2
        )

    def bn(self, p, x):
        n = x.shape[1]
        if p + ".weight" not in self.sd:
            r = lambda: torch.randn(n, generator=self.g)
            self.sd[p + ".weight"] = 1 + 0.1 * r()
            self.sd[p + ".bias"] = 0.1 * r()
            self.sd[p + ".running_mean"] = 0.1 * r()
            self.sd[p + ".running_var"] = (0.1 * r()).abs() + 0.5
        return torch.nn.functional.batch_norm(
            x, self.sd[p + ".running_mean"], self.sd[p + ".running_var"],
            self.sd[p + ".weight"], self.sd[p + ".bias"], training=False,
        )

    def forward(self, x, out_dim, *, width, stage1_planes, stage1_blocks,
                num_blocks, num_modules, stem_ch):
        relu = torch.relu
        up = lambda t, size: torch.nn.functional.interpolate(
            t, size=size, mode="bilinear", align_corners=True)
        x = relu(self.bn("bn1", self.conv("conv1", x, stem_ch, 3, 2)))
        x = relu(self.bn("bn2", self.conv("conv2", x, stem_ch, 3, 2)))
        for k in range(stage1_blocks):
            p = f"layer1.{k}"
            res = x
            h = relu(self.bn(p + ".bn1", self.conv(p + ".conv1", x, stage1_planes, 1)))
            h = relu(self.bn(p + ".bn2", self.conv(p + ".conv2", h, stage1_planes, 3)))
            h = self.bn(p + ".bn3", self.conv(p + ".conv3", h, stage1_planes * 4, 1))
            if x.shape[1] != stage1_planes * 4:
                res = self.bn(p + ".downsample.1",
                              self.conv(p + ".downsample.0", x, stage1_planes * 4, 1))
            x = relu(h + res)
        widths = [width * (2**i) for i in range(1 + len(num_modules))]
        xs = [x]
        for stage, nmod in zip(range(2, 2 + len(num_modules)), num_modules):
            cur = widths[:stage]
            t = stage - 1
            new_xs = []
            for i in range(len(cur)):
                if i < len(xs):
                    if xs[i].shape[1] != cur[i]:
                        h = relu(self.bn(f"transition{t}.{i}.1",
                                         self.conv(f"transition{t}.{i}.0", xs[i], cur[i], 3)))
                    else:
                        h = xs[i]
                else:
                    h = xs[-1]
                    for j in range(i + 1 - len(xs)):
                        ch = cur[i] if j == i - len(xs) else xs[-1].shape[1]
                        h = relu(self.bn(f"transition{t}.{i}.{j}.1",
                                         self.conv(f"transition{t}.{i}.{j}.0", h, ch, 3, 2)))
                new_xs.append(h)
            xs = new_xs
            for m in range(nmod):
                pm = f"stage{stage}.{m}"
                for i in range(len(cur)):
                    h = xs[i]
                    for k in range(num_blocks):
                        pb = f"{pm}.branches.{i}.{k}"
                        a = relu(self.bn(pb + ".bn1", self.conv(pb + ".conv1", h, cur[i], 3)))
                        a = self.bn(pb + ".bn2", self.conv(pb + ".conv2", a, cur[i], 3))
                        h = relu(a + h)
                    xs[i] = h
                outs = []
                for i in range(len(cur)):
                    acc = None
                    for j in range(len(cur)):
                        if j == i:
                            tt = xs[j]
                        elif j > i:
                            pf = f"{pm}.fuse_layers.{i}.{j}"
                            tt = self.bn(pf + ".1", self.conv(pf + ".0", xs[j], cur[i], 1))
                            tt = up(tt, xs[i].shape[2:])
                        else:
                            tt = xs[j]
                            for k in range(i - j):
                                last = k == i - j - 1
                                ch = cur[i] if last else cur[j]
                                pf = f"{pm}.fuse_layers.{i}.{j}.{k}"
                                tt = self.bn(pf + ".1", self.conv(pf + ".0", tt, ch, 3, 2))
                                if not last:
                                    tt = relu(tt)
                        acc = tt if acc is None else acc + tt
                    outs.append(relu(acc))
                xs = outs
        ups = [xs[0]] + [up(h, xs[0].shape[2:]) for h in xs[1:]]
        x = torch.cat(ups, 1)
        x = relu(self.bn("last_layer.1", self.conv("last_layer.0", x, x.shape[1], 1, bias=True)))
        return self.conv("last_layer.3", x, out_dim, 1, bias=True)


def test_ported_hrnet_matches_torch(rng):
    import jax.numpy as jnp

    from pixelspointspolygons_tpu.models.hrnet import HRNetEncoder
    from pixelspointspolygons_tpu.utils.torch_port import port_hrnet

    x_np = rng.rand(2, HR_IMG, HR_IMG, 3).astype(np.float32)
    ref = _TorchHR(seed=11)
    with torch.no_grad():
        want = ref.forward(torch.tensor(x_np).permute(0, 3, 1, 2), HR_OUT, **TOPO).numpy()

    model = HRNetEncoder(in_size=HR_IMG, out_dim=HR_OUT, **TOPO)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    new_vars, loaded, skipped = port_hrnet(ref.sd, variables, **TOPO)
    assert not skipped, skipped  # every enumerated entry must exist in the sd
    # and the sd must be fully consumed (no unmapped torch keys)
    consumed = set()
    from pixelspointspolygons_tpu.utils.torch_port import _hrnet_entries
    for tp, _, kind in _hrnet_entries(**TOPO):
        consumed |= {f"{tp}.weight", f"{tp}.bias"}
        if kind == "bn":
            consumed |= {f"{tp}.running_mean", f"{tp}.running_var"}
    assert set(ref.sd) <= consumed, set(ref.sd) - consumed

    got = model.apply(new_vars, jnp.asarray(x_np), train=False)
    want_nhwc = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want_nhwc, atol=3e-4, rtol=1e-4)


def test_hrnet_partial_port_keeps_init(rng):
    """ImageNet checkpoints lack last_layer.* — port must keep init there
    (reference intersect-and-update, hrnet48v2.py:542-552)."""
    import jax.numpy as jnp

    from pixelspointspolygons_tpu.models.hrnet import HRNetEncoder
    from pixelspointspolygons_tpu.utils.torch_port import port_hrnet

    ref = _TorchHR(seed=5)
    x_np = rng.rand(1, HR_IMG, HR_IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref.forward(torch.tensor(x_np).permute(0, 3, 1, 2), HR_OUT, **TOPO)
    sd = {k: v for k, v in ref.sd.items() if not k.startswith("last_layer")}

    model = HRNetEncoder(in_size=HR_IMG, out_dim=HR_OUT, **TOPO)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    new_vars, loaded, skipped = port_hrnet(sd, variables, **TOPO)
    assert set(skipped) == {"last_layer.0", "last_layer.1", "last_layer.3"}
    np.testing.assert_array_equal(
        new_vars["params"]["last_conv2"]["kernel"],
        variables["params"]["last_conv2"]["kernel"],
    )
    # still runs
    model.apply(new_vars, jnp.asarray(x_np), train=False)


def test_apply_pretrained_encoder_vit_graft():
    """apply_pretrained_encoder grafts a timm sd into every ViT trunk, keeping
    shape-mismatched leaves (e.g. pillar trunks without patch_embed) on init."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from pixelspointspolygons_tpu.utils.pretrained import _find_vit_trunks, _graft
    from pixelspointspolygons_tpu.utils.torch_port import port_timm_vit

    sd = make_torch_vit_state(seed=1)
    ported = port_timm_vit(sd, depth=DEPTH)

    model = ViTBackbone(img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH, num_heads=HEADS)
    x = jnp.zeros((1, IMG, IMG, 3))
    init = jax.tree_util.tree_map(np.asarray, model.init(jax.random.PRNGKey(0), x)["params"])
    tree = {"encoder": {"vit": dict(init)}, "decoder": {"w": np.zeros((3, 3))}}
    assert _find_vit_trunks(tree) == [("encoder", "vit")]

    loaded, skipped = _graft(tree["encoder"]["vit"], ported)
    assert skipped == 0 and loaded > 0
    np.testing.assert_array_equal(
        tree["encoder"]["vit"]["cls_token"], sd["cls_token"].numpy()
    )

    # shape mismatch (different pos_embed length) is kept on init, not crashed
    tree2 = {"vit": dict(init)}
    tree2["vit"]["pos_embed"] = np.zeros((1, 5, DIM), np.float32)
    loaded2, skipped2 = _graft(tree2["vit"], ported)
    assert skipped2 == 1
    assert tree2["vit"]["pos_embed"].shape == (1, 5, DIM)


class TestRealCheckpointRobustness:
    """Real released checkpoints wrap the trunk and carry extras the reference
    absorbs with fuzzy key matching (misc/shared_utils.py:67-118); our port
    functions must tolerate them: wrapper prefixes, classification heads,
    mask_token, separate-q/k/v attention, and pos_embed grids ≠ our in_size."""

    def _realish_sd(self):
        sd = make_torch_vit_state(seed=3)
        # separate q/k/v variant for block 1
        p = "blocks.1."
        qw, kw, vw = torch.split(sd.pop(p + "attn.qkv.weight"), DIM, dim=0)
        qb, kb, vb = torch.split(sd.pop(p + "attn.qkv.bias"), DIM, dim=0)
        sd.update({p + "attn.q.weight": qw, p + "attn.k.weight": kw,
                   p + "attn.v.weight": vw, p + "attn.q.bias": qb,
                   p + "attn.k.bias": kb, p + "attn.v.bias": vb})
        # DDP-style prefix + real-checkpoint extras
        wrapped = {f"module.{k}": v for k, v in sd.items()}
        wrapped["module.head.weight"] = torch.zeros(10, DIM)
        wrapped["module.head.bias"] = torch.zeros(10)
        wrapped["module.mask_token"] = torch.zeros(1, DIM)
        return sd, wrapped

    def test_prefix_extras_and_split_qkv(self):
        sd, wrapped = self._realish_sd()
        from pixelspointspolygons_tpu.utils.torch_port import (
            normalize_state_dict,
            vit_unconsumed_keys,
        )

        norm, prefix = normalize_state_dict({k: v.numpy() for k, v in wrapped.items()})
        assert prefix == "module."
        extras = vit_unconsumed_keys(norm)
        assert sorted(extras) == ["head.bias", "head.weight", "mask_token"]

        params = port_timm_vit(wrapped, depth=DEPTH)
        want = port_timm_vit(sd, depth=DEPTH)  # plain fused-qkv layout
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pos_embed_interpolation(self):
        from pixelspointspolygons_tpu.utils.torch_port import interpolate_pos_embed

        g_src, g_dst = IMG // PATCH, 6
        pos = np.random.RandomState(0).rand(1, g_src * g_src + 1, DIM).astype(np.float32)
        out = interpolate_pos_embed(pos, g_dst * g_dst + 1)
        assert out.shape == (1, g_dst * g_dst + 1, DIM)
        np.testing.assert_array_equal(out[0, 0], pos[0, 0])  # cls row untouched
        # constant field stays constant under bilinear resampling
        const = np.concatenate([np.zeros((1, 1, DIM)), np.full((1, g_src**2, DIM), 7.0)], 1).astype(np.float32)
        out_c = interpolate_pos_embed(const, g_dst * g_dst + 1)
        np.testing.assert_allclose(out_c[0, 1:], 7.0, rtol=1e-6)

    def test_from_pth_smoke_cli(self, tmp_path):
        """--from-pth drives apply_pretrained_encoder end to end on a padded
        fake 'real' checkpoint (VERDICT r2 next-step #8)."""
        import os
        import subprocess
        import sys as _sys

        _, wrapped = self._realish_sd()
        # full-size ViT-S/8 trunk so shapes match the p2p_image encoder
        full = make_torch_vit_state(seed=4)
        # rebuild at production dims (384, depth 12, patch 8, img 224)
        g = torch.Generator().manual_seed(5)
        r = lambda *s: torch.randn(*s, generator=g) * 0.05
        D = 384
        full = {
            "cls_token": r(1, 1, D),
            "pos_embed": r(1, 28 * 28 + 1, D),
            "patch_embed.proj.weight": r(D, 3, 8, 8),
            "patch_embed.proj.bias": r(D),
            "norm.weight": 1 + 0.1 * r(D),
            "norm.bias": r(D),
        }
        for i in range(12):
            p = f"blocks.{i}."
            full.update({
                p + "norm1.weight": 1 + 0.1 * r(D), p + "norm1.bias": r(D),
                p + "attn.qkv.weight": r(3 * D, D), p + "attn.qkv.bias": r(3 * D),
                p + "attn.proj.weight": r(D, D), p + "attn.proj.bias": r(D),
                p + "norm2.weight": 1 + 0.1 * r(D), p + "norm2.bias": r(D),
                p + "mlp.fc1.weight": r(4 * D, D), p + "mlp.fc1.bias": r(4 * D),
                p + "mlp.fc2.weight": r(D, 4 * D), p + "mlp.fc2.bias": r(D),
            })
        wrapped_full = {f"module.{k}": v for k, v in full.items()}
        wrapped_full["module.head.weight"] = torch.zeros(10, D)
        wrapped_full["module.mask_token"] = torch.zeros(1, D)
        pth = tmp_path / "fake_dino.pth"
        torch.save({"state_dict": wrapped_full}, pth)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [_sys.executable, "scripts/download_pretrained.py", "--from-pth", str(pth),
             "experiment=p2p_image", "run_type=debug",
             # small in_size exercises pos_embed interpolation (28² → 8² grid)
             "experiment.encoder.in_size=64"],
            capture_output=True, text=True, cwd=repo, env=env, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        combined = out.stdout + out.stderr
        assert "from-pth smoke OK" in combined
        assert "interpolated pos_embed" in combined
